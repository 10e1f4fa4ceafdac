"""Generic fit/test loop template.

Re-design of the reference's lightning scaffolding
(STEM-GNN/dataset/gp/lightning/training.py:11-159 ``lightning_fit``/
``lightning_test``, module_template.py ``BaseTemplate``, metric.py
``EvalKit``): a framework-owned training driver that owns the epoch loop,
validation cadence, best-checkpoint selection, early stopping, and metric
aggregation — the user supplies pure step functions.

The reference's OOM-batch-skip (module_template.py:100-106) has no analog
under jit (shapes are static, memory is planned at compile time); its role is
covered by padding-bucket validation at batch build time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import numpy as np

from stemgnn_tpu.utils import EarlyStopping, Logger


@dataclasses.dataclass
class EvalKit:
    """Named metric evaluators + which one drives model selection
    (gp/lightning/metric.py:90 analog).  ``metrics`` maps name ->
    fn(preds, targets) -> float; ``select`` is the driving metric;
    ``mode`` 'max' or 'min'."""
    metrics: Dict[str, Callable]
    select: str
    mode: str = "max"

    def evaluate(self, preds, targets) -> Dict[str, float]:
        return {k: float(fn(preds, targets))
                for k, fn in self.metrics.items()}


def fit(train_epoch_fn: Callable[[Any, int], Any],
        eval_fn: Callable[[Any], Dict[str, float]],
        state: Any, *, epochs: int, evalkit: EvalKit,
        patience: Optional[int] = None, eval_every: int = 1,
        on_best: Optional[Callable[[Any, int], None]] = None,
        logger: Optional[Logger] = None, run_idx: int = 0,
        verbose: bool = False):
    """Generic fit loop.

    ``train_epoch_fn(state, epoch) -> (state, loss_dict)``;
    ``eval_fn(state) -> {'train':…, 'val':…, 'test':…}`` (floats).
    Returns (state, best_record, logger).
    """
    logger = logger or Logger()
    stopper = EarlyStopping(patience=patience) if patience else None
    best = {"val": -np.inf if evalkit.mode == "max" else np.inf,
            "epoch": -1, "result": None}
    sign = 1.0 if evalkit.mode == "max" else -1.0

    for epoch in range(epochs):
        state, loss = train_epoch_fn(state, epoch)
        if epoch % eval_every:
            continue
        result = eval_fn(state)
        result.setdefault("metric", evalkit.select)
        logger.log(run_idx, epoch, loss, dict(result))
        if sign * result["val"] > sign * best["val"]:
            best.update(val=result["val"], epoch=epoch, result=result)
            if on_best is not None:
                on_best(state, epoch)
        if stopper is not None and stopper(result):
            if verbose:
                print(f"early stop at epoch {epoch}")
            break
    return state, best, logger


def test(eval_fn: Callable[[Any], Dict[str, float]], state: Any,
         evalkit: EvalKit) -> Dict[str, float]:
    """lightning_test analog: one evaluation pass."""
    return eval_fn(state)
