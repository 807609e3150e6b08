"""rgk_tpu — a TPU-native differentiable path tracer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the RGKrt
reference renderer (a CPU C++ path tracer): wavefront path tracing over
flat ray batches, SoA scene arrays resident in HBM, branchless BxDF
dispatch, counter-based stateless low-discrepancy sampling, host-built
BVH traversed on device, and SPMD scaling over a `jax.sharding.Mesh`.

Public entry points:
    rgk_tpu.scene.config.load_config      — parse a scene JSON (reference-compatible)
    rgk_tpu.scene.builder.SceneBuilder    — build & commit a scene to device arrays
    rgk_tpu.driver.render.RenderDriver    — progressive rounds/timed render loop
    rgk_tpu.driver.cli.main               — command-line interface
"""

__version__ = "0.1.0"
