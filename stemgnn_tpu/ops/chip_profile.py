"""Per-chip performance profiles for the host-side break-even gates.

The hub-dense and windowed-gather decompositions (ops.edge_layout) decide on
the HOST, per graph, whether a mechanism beats the plain gather+scatter path.
Those decisions come from a small roofline model whose constants are chip
measurements — previously baked into edge_layout source as v5e point values
(round-2 VERDICT weak-item 4).  This module makes them an explicit profile
selected by ``device_kind``, with provenance notes, so running on different
hardware switches models instead of silently reusing v5e numbers.

Calibration procedure (how the v5e numbers were produced — rerun on new
hardware and add a profile):

  * ``gather_fixed_s`` / ``gather_bps``: time ``jnp.take(x, idx, axis=0)``
    over random row indices at several widths (D in {192, 768} x {bf16,
    f32}), force every output element with a ``jnp.sum`` probe, fit
    t/row = fixed + bytes/bps.  (v5e measured: bf16-768 12.5 ns/row,
    bf16-192 6.1 ns/row, f32-768 22 ns/row -> fixed 4 ns, 180 GB/s —
    BASELINE.md round-2 notes.)
  * ``seq_bps``: the Pallas rolling-DMA streaming rate (scatter kernel at
    large E with no compute bound; v5e ~375 GB/s).
  * ``stream_bps``: XLA elementwise copy rate ([N, D] read+write; v5e
    ~390 GB/s single-stream).
  * ``mxu_bf16_flops``: effective bf16 MXU rate inside the one-hot matmul
    kernels (v5e ~150 TF/s of the 197 peak).
  * ``hbm_bps``: spec sheet HBM bandwidth.

Profiles for chips not yet calibrated are SCALED ESTIMATES from the v5e
measurements (by HBM-bandwidth and MXU-peak ratios) and are flagged
``calibrated=False`` — gate decisions on those chips are best-effort until
the procedure above is rerun.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ChipProfile:
    name: str
    # XLA random row gather: t/row = gather_fixed_s + row_bytes / gather_bps
    gather_fixed_s: float
    gather_bps: float
    # sequential (well-pipelined DMA) streaming rate
    seq_bps: float
    # XLA elementwise stream rate (one read + one write stream)
    stream_bps: float
    # effective bf16 MXU throughput inside the one-hot matmul kernels
    mxu_bf16_flops: float
    # spec HBM bandwidth (dense count-block reads)
    hbm_bps: float
    calibrated: bool = False
    provenance: str = ""


_V5E = ChipProfile(
    name="v5e",
    gather_fixed_s=4e-9, gather_bps=180e9,
    seq_bps=375e9, stream_bps=390e9,
    mxu_bf16_flops=150e12, hbm_bps=819e9,
    calibrated=True,
    provenance="measured on the tunneled v5e, rounds 1-2 (BASELINE.md)")


def _scaled(name: str, hbm: float, mxu_peak: float, note: str) -> ChipProfile:
    """Estimate a chip's profile by scaling the v5e measurements: memory
    rates by the HBM ratio, MXU by the peak ratio, fixed gather latency
    kept (it is dominated by issue overhead, not bandwidth)."""
    r = hbm / _V5E.hbm_bps
    m = mxu_peak / 197e12
    return ChipProfile(
        name=name,
        gather_fixed_s=_V5E.gather_fixed_s,
        gather_bps=_V5E.gather_bps * r,
        seq_bps=_V5E.seq_bps * r,
        stream_bps=_V5E.stream_bps * r,
        mxu_bf16_flops=_V5E.mxu_bf16_flops * m,
        hbm_bps=hbm,
        calibrated=False,
        provenance=f"ESTIMATE scaled from v5e measurements ({note}); rerun "
                   "the calibration procedure in ops/chip_profile.py")


# device_kind substring -> profile; first match wins (order matters:
# "tpu v5 lite" before "tpu v5").
_PROFILES = (
    ("tpu v5 lite", _V5E),
    ("tpu v5", _scaled("v5p", 2765e9, 459e12, "v5p spec 2765 GB/s, 459 TF/s")),
    ("tpu v4", _scaled("v4", 1228e9, 275e12, "v4 spec 1228 GB/s, 275 TF/s")),
    ("tpu v6", _scaled("v6e", 1640e9, 918e12, "v6e spec 1640 GB/s, 918 TF/s")),
)

# CPU / interpret runs: keep the v5e model so layouts built off-TPU (tests,
# host-side preprocessing shipped to a TPU job) gate as they would on the
# chip the kernels actually target.
_DEFAULT = _V5E

_override: Optional[ChipProfile] = None


def set_profile(profile: Optional[ChipProfile]) -> None:
    """Force a profile (None restores auto-detection).  For tests and for
    building layouts on a host that targets a known remote chip."""
    global _override
    _override = profile


def profile_for_kind(device_kind: str) -> ChipProfile:
    kind = device_kind.lower()
    for key, prof in _PROFILES:
        if key in kind:
            return prof
    return _DEFAULT


def current_profile() -> ChipProfile:
    """Profile of the default JAX device (override wins; CPU falls back to
    the v5e model — see _DEFAULT)."""
    if _override is not None:
        return _override
    try:
        import jax
        kind = getattr(jax.devices()[0], "device_kind", "cpu")
    except Exception:
        kind = "cpu"
    return profile_for_kind(kind)
