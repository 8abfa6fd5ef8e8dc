"""pmpu_tpu — TPU-native Probabilistic Multiplanar U-Net framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``qzs634/Probabilistic-Multiplanar-Unet`` (reference mounted at
``/root/reference``): multi-planar NIfTI slice sampling, deterministic and
probabilistic (CVAE) U-Nets, ELBO training, and fused multi-view 3D
evaluation — built TPU-first:

* all math is XLA-compiled (``jax.jit``), NHWC layout, bfloat16-capable;
* the multi-planar slice sampler is device-resident (XLA gather /
  Pallas kernel) instead of the reference's per-slice host NIfTI reload
  (reference ``utils/mri_dataset.py:124-127``);
* whole-volume multi-view inference runs as one on-device batched pipeline
  instead of a batch-size-1 host loop (reference ``eval.py:131-216``);
* scaling is expressed with ``jax.sharding.Mesh`` + XLA collectives.
"""

import os as _os

if _os.environ.get("PMPU_FORCE_CPU", "").lower() not in ("", "0", "false"):
    # must run before any JAX backend initialization (the image's
    # sitecustomize pins the axon TPU platform regardless of JAX_PLATFORMS)
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ.get("PMPU_CPU_DEVICES", "1"))
        )
    except RuntimeError:
        pass  # backend already up — leave it be

__version__ = "0.1.0"

from pmpu_tpu.models import UNet, ProbabilisticUNet  # noqa: F401
