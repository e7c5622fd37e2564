from vri_tpu.hydra.delegate import ChangeTracker, DirtyBits, RenderDelegate  # noqa: F401
