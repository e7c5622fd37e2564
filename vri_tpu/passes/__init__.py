from vri_tpu.passes.frame import FrameParams, render_frame  # noqa: F401
