"""Task adapters (Strategy pattern) — the reference's trainer layer.

The reference defines a 4-method ``Trainer`` ABC (predict/eval/loss/
mask_to_image, ``trainer/trainer.py:1-13``) with ``UNetTrainer`` and
``ProbUNetTrainer`` implementations so the loop layer is model-agnostic
(``train.py:241-244``). Here the same seam is pure-functional: a ``Task``
exposes ``init_variables`` / ``train_loss`` / ``predict`` / ``val_loss``,
all jit-safe with explicit PRNG keys, and the loop/eval layers are written
against it.

Differences from the reference that are deliberate fixes (SURVEY.md §0):

* validation loss of the probabilistic model recomputes the posterior from
  the *current* batch instead of reusing a stale posterior from the last
  training batch (reference bug at ``train.py:141-153`` /
  ``probabilistic_unet.py:220-221,290``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from pmpu_tpu.models import ProbabilisticUNet, UNet
from pmpu_tpu.ops import losses


class UNetTask:
    """Deterministic U-Net task — reference ``trainer/unet_trainer.py:9-58``."""

    name = "unet"
    is_probabilistic = False

    def __init__(
        self,
        n_channels: int = 1,
        n_classes: int = 1,
        num_filters: Sequence[int] = (64, 128, 256, 512, 1024),
        dtype: Any = None,
        loss_type: str = "auto",
        class_weights=None,
        split_decoder: bool = False,
    ):
        self.n_classes = n_classes
        self.loss_type = loss_type  # auto (reference CE/BCE) | dice | ce+dice
        self.class_weights = class_weights
        self.net = UNet(
            n_channels=n_channels,
            n_classes=n_classes,
            num_filters=tuple(num_filters),
            dtype=dtype,
            split_decoder=split_decoder,
        )

    def init_variables(self, key, img, msk):
        return self.net.init(key, img, train=False)

    def _loss(self, preds, msk):
        base = losses.unet_loss(preds, msk, self.n_classes, self.class_weights)
        if self.loss_type == "auto":
            return base
        # soft-Dice objective over foreground classes (BASELINE config 1)
        m = msk[..., 0] if msk.ndim == 4 else msk
        if self.n_classes == 1:
            dice = losses.soft_dice_loss(preds[..., 0], m.astype(preds.dtype))
        else:
            probs = jax.nn.softmax(preds, axis=-1)
            per_class = [
                losses.soft_dice_loss(probs[..., c], (m == c).astype(probs.dtype))
                for c in range(1, self.n_classes)
            ]
            dice = sum(per_class) / len(per_class)
        return dice if self.loss_type == "dice" else base + dice

    def train_loss(self, params, batch_stats, img, msk, key):
        preds, mut = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            img,
            train=True,
            mutable=["batch_stats"],
        )
        loss = self._loss(preds, msk)
        return loss, (mut["batch_stats"], {"loss": loss})

    def predict(self, variables, img, msk=None, key=None, *, train: bool = False):
        """Forward pass → sigmoid probs (1 class) / logits (reference
        ``unet_trainer.py:25-28``). Eval mode uses BN running stats."""
        return self.net.apply(variables, img, train=False)

    def val_loss(self, variables, img, msk, key=None):
        preds = self.net.apply(variables, img, train=False)
        return self._loss(preds, msk), preds


class ProbUNetTask:
    """Probabilistic U-Net task — reference ``trainer/probunet_trainer.py:10-39``."""

    name = "probunet"
    is_probabilistic = True

    def __init__(
        self,
        n_channels: int = 1,
        n_classes: int = 3,
        num_filters: Sequence[int] = (64, 128, 256, 512, 1024),
        latent_dim: int = 6,
        no_convs_fcomb: int = 4,
        beta: float = 10.0,
        dtype: Any = None,
        class_weights=None,
        split_decoder: bool = False,
    ):
        self.n_classes = n_classes
        self.beta = beta
        self.class_weights = class_weights
        self.net = ProbabilisticUNet(
            input_channels=n_channels,
            num_classes=n_classes,
            num_filters=tuple(num_filters),
            latent_dim=latent_dim,
            no_convs_fcomb=no_convs_fcomb,
            beta=beta,
            dtype=dtype,
            split_decoder=split_decoder,
        )

    def init_variables(self, key, img, msk):
        return self.net.init(
            key, img, self._as_float(msk), train=False, method=ProbabilisticUNet.initialize
        )

    @staticmethod
    def _as_float(msk):
        return msk.astype(jnp.float32)

    def train_loss(self, params, batch_stats, img, msk, key):
        """−ELBO with z_q ~ posterior — reference ``probabilistic_unet.py:281-308``.

        One fused forward of the three towers (posterior, prior, unet) in BN
        train mode, then a posterior sample decoded through fcomb.
        """
        out, mut = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            img,
            self._as_float(msk),
            train=True,
            mutable=["batch_stats"],
        )
        z_q = out.posterior.sample(key)
        logits = self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            out.unet_features,
            z_q,
            method=ProbabilisticUNet.decode,
        )
        loss, aux = losses.elbo_loss(
            logits, msk, out.posterior, out.prior, self.beta, self.n_classes,
            self.class_weights,
        )
        aux["loss"] = loss
        return loss, (mut["batch_stats"], aux)

    def predict(
        self,
        variables,
        img,
        msk=None,
        key: Optional[jax.Array] = None,
        *,
        train: bool = False,
        z: Optional[jax.Array] = None,
    ):
        """Forward + prior-sample decode (reference ``probunet_trainer.py:27-32``:
        rsample≡sample for inference; z override = ``sample_at``). Returns
        sigmoid probs for n_classes==1 / logits otherwise — the same
        prediction contract as :meth:`UNetTask.predict` (the fcomb head is
        linear, unlike UNet's built-in 1-class sigmoid)."""
        out = self.net.apply(variables, img, train=False)
        if z is None:
            z = out.prior.sample(key)
        logits = self.net.apply(
            variables, out.unet_features, z, method=ProbabilisticUNet.decode
        )
        return jax.nn.sigmoid(logits) if self.n_classes == 1 else logits

    def val_loss(self, variables, img, msk, key=None):
        """Validation −ELBO from a freshly-computed posterior (fixes the
        reference's stale-posterior validation, SURVEY.md §0)."""
        out = self.net.apply(variables, img, self._as_float(msk), train=False)
        z_q = out.posterior.sample(key)
        logits = self.net.apply(
            variables, out.unet_features, z_q, method=ProbabilisticUNet.decode
        )
        loss, _ = losses.elbo_loss(
            logits, msk, out.posterior, out.prior, self.beta, self.n_classes
        )
        # prediction for dice: prior sample (reference validation path);
        # binary preds squash to probs so per_class_dice's 0.5 threshold
        # (reference unet_trainer.py:43) applies uniformly
        key2 = jax.random.fold_in(key, 1)
        preds = self.net.apply(
            variables, out.unet_features, out.prior.sample(key2), method=ProbabilisticUNet.decode
        )
        if self.n_classes == 1:
            preds = jax.nn.sigmoid(preds)
        return loss, preds


def make_task(name: str, **kw):
    """Factory keyed by the reference's ``-m unet|probunet`` flag."""
    if name == "unet":
        kw.setdefault("n_classes", 1)  # train.py:242 builds the binary UNet
        return UNetTask(**kw)
    if name == "probunet":
        kw.setdefault("n_classes", 3)  # train.py:244
        return ProbUNetTask(**kw)
    raise ValueError(f"unknown model {name!r} (expected unet|probunet)")
