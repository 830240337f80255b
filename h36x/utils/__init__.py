"""Shared utilities: phase timers, logging."""

from h36x.utils.timers import PhaseTimers  # noqa: F401
