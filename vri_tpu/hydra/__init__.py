"""Hydra-style scene-sync layer (lazy exports to avoid import cycles —
registry imports hydra.material while delegate imports registry)."""


def __getattr__(name):
    if name in ("ChangeTracker", "DirtyBits", "RenderDelegate"):
        from vri_tpu.hydra import delegate as _d

        return getattr(_d, name)
    raise AttributeError(name)
