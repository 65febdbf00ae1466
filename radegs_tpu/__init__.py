"""radegs_tpu — a TPU-native (JAX/XLA/Pallas) Gaussian-splatting framework.

A from-scratch reimplementation of the capabilities of RaDe-GS
("Rasterizing Depth in Gaussian Splatting"), designed TPU-first:

- ``core``     — pure math: cameras, SH, covariance/EWA projection, the
                 RaDe-GS ray-space depth / camera-plane / normal derivation.
- ``ops``      — the differentiable rasterizer: static-shape tile binning,
                 chunked alpha blending with a custom VJP, Pallas TPU kernels,
                 point integration (SDF), KNN, SSIM.
- ``models``   — Gaussian parameter store with capacity-padded densification,
                 Mip-Splatting 3D filter, appearance network.
- ``train``    — training loop, losses, schedules, optimizer.
- ``data``     — COLMAP / Blender (NeRF-synthetic) scene readers.
- ``parallel`` — device-mesh sharding (gaussian + tile axes) for multi-chip.
- ``mesh``     — TSDF fusion and Marching-Tetrahedra surface extraction.
- ``eval``     — image metrics and geometry evaluation protocols.

Reference behavior is documented per-function with ``path:line`` citations
into the RaDe-GS snapshot (see SURVEY.md).
"""

__version__ = "0.1.0"
