"""Feature-extraction stage: fused preprocess + ResNet-50 -> feature shards."""

from h36x.extract.writer import AsyncWriter  # noqa: F401
