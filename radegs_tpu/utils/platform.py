"""Device-platform selection for the CLIs.

The axon TPU plugin hijacks platform selection via sitecustomize, so the
``JAX_PLATFORMS`` env var is silently ignored; the only reliable override is
``jax.config.update("jax_platforms", ...)`` after importing jax (CLAUDE.md).
Every CLI exposes ``--device {auto,cpu,tpu}`` through this helper so a user
can run train/render/mesh extraction on CPU without touching the one TPU
(only one process may hold it — a second hangs silently).
"""

from __future__ import annotations


def add_device_arg(parser):
    parser.add_argument(
        "--device", choices=["auto", "cpu", "tpu"], default="auto",
        help="force the jax platform (auto = whatever the plugin picks; "
             "cpu is the safe choice while another process holds the TPU)")


def apply_device(name: str) -> None:
    """Apply --device BEFORE any jax computation runs (backend init is
    sticky). 'auto' is a no-op; 'tpu' asserts the plugin delivered one."""
    if name == "auto":
        return
    import jax

    if name == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", (
            f"--device tpu requested but backend is {jax.default_backend()}")
