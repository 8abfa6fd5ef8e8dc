"""Host-side ReduceLROnPlateau matching torch semantics.

The reference uses ``optim.lr_scheduler.ReduceLROnPlateau(optimizer,
'min' if n_classes>1 else 'max', factor=lrf, patience=lrp)``
(``train.py:66``) stepped once per validation round with the val metric
(``train.py:182``). The learning rate is a host scalar injected into the
jitted step each call, so changing it never triggers recompilation.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReduceLROnPlateau:
    """torch-parity plateau scheduler (mode, factor, patience, rel threshold
    1e-4, min_lr 0) — state is a plain dataclass so it checkpoints cleanly."""

    lr: float
    mode: str = "min"  # 'min' if n_classes>1 else 'max' (train.py:66)
    factor: float = 0.1
    patience: int = 5
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float | None = None
    num_bad_epochs: int = field(default=0)

    def _is_better(self, current: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return current < self.best * (1.0 - self.threshold)
        return current > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Record one validation metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "mode": self.mode,
            "factor": self.factor,
            "patience": self.patience,
            "threshold": self.threshold,
            "min_lr": self.min_lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "ReduceLROnPlateau":
        return cls(**d)
