"""Observability: metrics logging, profiling, preemption handling.

Re-designs of the reference's operational layer (SURVEY.md §5):

  * ``MetricsLogger`` — the wandb-by-default logging (reference
    pretrain.py:183-188, finetune.py:314-320) behind an interface: wandb when
    installed+enabled, JSONL file and/or stdout otherwise.  Metric-name schema
    mirrors the reference (losses/..., train/..., best/..., final/...).
  * ``profile_trace`` — jax.profiler trace context (replacing SmartTimer
    probes, gp/utils/utils.py:17-46) + an edges/s throughput counter.
  * ``PreemptionHandler`` — SIGTERM/SIGINT-aware checkpoint-on-preemption for
    TPU preemptible slices; the reference's per-epoch try/except checkpoint
    (pretrain.py:160-165) is the crash-recovery baseline this extends.
"""

from __future__ import annotations

import contextlib
import json
import os
import signal
import time
from typing import Optional


def apply_wandb_sweep_config(args, project: str, debug: bool = False):
    """wandb sweep round-trip (reference finetune.py:314-321,
    degree_shift_ood.py:501-507): ``wandb.init(config=vars(args))`` then
    read the hyperparameters BACK from ``wandb.config`` so a sweep agent's
    overrides drive the run.

    Mutates ``args`` in place with any keys the sweep changed (coerced to
    the existing attribute's type) and returns it.  A no-op whenever the
    wandb SDK is missing, the network is down, or ``debug`` is set — the
    offline default behavior is unchanged.
    """
    if debug:
        return args
    try:
        import wandb
    except Exception:
        return args
    base = {k: v for k, v in vars(args).items()
            if isinstance(v, (int, float, str, bool, type(None)))}
    try:
        if wandb.run is None:
            wandb.init(project=project, config=base)
        swept = dict(wandb.config)
    except Exception:
        return args
    for k, v in swept.items():
        if k not in base or v == base[k]:
            continue
        cur = base[k]
        try:
            if isinstance(cur, bool):
                v = bool(v)
            elif isinstance(cur, int) and not isinstance(v, bool):
                v = int(v)
            elif isinstance(cur, float):
                v = float(v)
        except (TypeError, ValueError):
            continue
        setattr(args, k, v)
        print(f"[wandb sweep] {k}: {cur!r} -> {v!r}")
    return args


class MetricsLogger:
    """Schema-compatible metrics sink.

    backends: 'stdout', 'jsonl', 'wandb' (any subset).  wandb silently
    degrades to disabled when the SDK or network is unavailable.
    """

    def __init__(self, backends=("jsonl",), jsonl_path: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 wandb_name: Optional[str] = None, config: Optional[dict] = None,
                 debug: bool = False):
        self.backends = set(backends) if not debug else {"stdout"}
        self._file = None
        self._wandb = None
        self._step = 0
        if "jsonl" in self.backends:
            path = jsonl_path or "metrics.jsonl"
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._file = open(path, "a")
        if "wandb" in self.backends:
            try:
                import wandb
                self._wandb = wandb
                if wandb.run is None:  # reuse a sweep agent's run if live
                    wandb.init(project=wandb_project or "stemgnn-tpu",
                               name=wandb_name, config=config or {},
                               mode="disabled" if debug else "online")
            except Exception:
                self._wandb = None

    def log(self, payload: dict, step: Optional[int] = None):
        step = self._step if step is None else step
        self._step = step + 1
        payload = {k: (float(v) if hasattr(v, "__float__") else v)
                   for k, v in payload.items()}
        if self._file is not None:
            self._file.write(json.dumps({"step": step, **payload},
                                        default=str) + "\n")
            self._file.flush()
        if "stdout" in self.backends:
            msg = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                           f"{k}={v}" for k, v in payload.items())
            print(f"[metrics {step}] {msg}")
        if self._wandb is not None:
            try:
                self._wandb.log(payload, step=step)
            except Exception:
                self._wandb = None

    def finish(self):
        if self._file is not None:
            self._file.close()
            self._file = None
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/stemgnn_trace", enabled: bool = True):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """edges/s / nodes/s counters — first-class per BASELINE.json metric."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.edges = 0
        self.nodes = 0
        self.steps = 0

    def update(self, num_edges: int, num_nodes: int = 0):
        self.edges += int(num_edges)
        self.nodes += int(num_nodes)
        self.steps += 1

    def rates(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {"throughput/edges_per_s": self.edges / dt,
                "throughput/nodes_per_s": self.nodes / dt,
                "throughput/steps_per_s": self.steps / dt}


class PreemptionHandler:
    """Latches SIGTERM/SIGINT; training loops poll ``should_stop`` at step
    boundaries and checkpoint before exiting."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self.should_stop = False
        self._prev = {}
        for sig in signals:
            self._prev[sig] = signal.signal(sig, self._handler)

    def _handler(self, signum, frame):
        self.should_stop = True

    def restore(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
