"""Host-side visualization tools (numpy + matplotlib)."""

from h36x.viz.anim import (  # noqa: F401
    plot_batch_sample,
    plot_batch_sample_2d_2dproj_3d,
    plot_batch_sample_2d_2dproj_3d_no_video,
    plot_sequence_3d,
    to_uint8_rgb,
)
