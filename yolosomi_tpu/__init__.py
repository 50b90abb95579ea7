"""yolosomi_tpu — TPU-native small-object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
isxml/YOLO-SOMI reference (YOLOv5-family drone-imagery detector):

- YAML-driven model graph compiler (registry-based, no eval) building pure
  functional Flax models in NHWC layout (reference: models/yolo.py:1453).
- Tier-1 module zoo: Conv/C2f/C2fCBAM/C2fEMACBAM/SPPF/BiFPN/SEAM/ODConv and
  anchor-based Detect / DecoupledDetect heads (reference: models/common.py).
- Static-shape XLA postprocessing (NMS) and padded vectorized loss/target
  assignment so train and eval steps jit end-to-end.
- SPMD data parallelism via jax.sharding.Mesh + NamedSharding (replacing the
  reference's torch.distributed/NCCL DDP, reference: train.py:422-429).
- Pallas TPU kernels for deformable convolution (DCNv3) with a jnp reference
  implementation as the parity oracle (reference: models/ops_dcnv3/).
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default (opt out with
    YOLOSOMI_COMPILE_CACHE=0; override dir with YOLOSOMI_COMPILE_CACHE=<path>).

    First flagship train-step compile costs ~20 min on the remote-compile
    tunnel runtime; with the cache a process restart (resume, evolve
    generations, CLI re-runs) replays the serialized executable in
    seconds (verified cross-process on the tunnel backend)."""
    import os

    setting = os.environ.get("YOLOSOMI_COMPILE_CACHE", "")
    if setting == "0":
        return
    path = setting if setting not in ("", "1") else os.path.expanduser(
        "~/.cache/yolosomi_tpu/xla-cache"
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # jax absent or too old: cache is best-effort
        pass


_enable_compile_cache()
