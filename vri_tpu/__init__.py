"""vri_tpu — a TPU-native (JAX/XLA/Pallas) re-imagining of
parsaiej/Vulkan-Raytraced-Indirect.

The reference is a Windows/Vulkan USD Hydra render delegate: it syncs USD
stage prims (meshes, MaterialX materials, cameras) into GPU buffers, renders a
visibility buffer with bindless barycentric attribute reconstruction, and
maintains an AMD-Brixelizer-style sparse-brick SDF cascade clipmap used for
ray-marched debug visualization and (intended) 1-bounce GI
(reference: Source/RenderPass.cpp, Source/ResourceRegistry.cpp,
External/FidelityFX/include/FidelityFX/gpu/brixelizer/*).

This package rebuilds those capabilities TPU-first:

- ``vri_tpu.usd``      — host-side USD-lite: USDA parsing, stages, procedural
                         scenes (replaces the pxr/OpenUSD dependency).
- ``vri_tpu.hydra``    — Hydra-style scene delegate: change tracking, mesh /
                         material / camera prim sync (reference Source/Mesh.cpp,
                         Source/Material.cpp, Source/FreeCamera.cpp).
- ``vri_tpu.registry`` — ResourceRegistry: flattens synced prims into packed,
                         padded structure-of-arrays device buffers — the
                         TPU-equivalent of the reference's bindless descriptor
                         tables (Source/ResourceRegistry.cpp).
- ``vri_tpu.ops``      — the compute path: Pallas/jit kernels for visibility
                         (tiled raster + LBVH wavefront trace), barycentric
                         attribute reconstruction, sparse-brick SDF cascade
                         build + sphere-marched trace, shading/lightloop,
                         texture sampling.
- ``vri_tpu.passes``   — the render pass graph as pure jitted functions over a
                         FrameState pytree (reference Source/RenderPass.cpp).
- ``vri_tpu.parallel`` — device-mesh layer: framebuffer tile sharding over a
                         ``jax.sharding.Mesh`` and ICI halo exchange of GI
                         cascade bricks (no reference equivalent — the
                         reference is single-GPU).
- ``vri_tpu.runtime``  — native C++ ingest/cache library bindings, profiling,
                         scene cache (checkpoint/resume).
"""

__version__ = "0.1.0"

from vri_tpu.config import RenderConfig, SDFConfig, SceneLimits  # noqa: F401
