"""Speed-of-light (roofline) model for the CTR-GC kernels.

BASELINE.md's kernel target is "measured edges/s/chip vs speed-of-light";
this module supplies the denominator. The unit CTR-GC op (ops/pallas/ctr_gc.py)
has three potential floors, and SoL is the max (DMA, VPU and MXU issue all
overlap on the TensorCore):

  * bytes-bound — the mandatory HBM traffic. The fused kernel keeps the
    (N, V, V, C) refined-adjacency tensor in VMEM, so what MUST move is the
    packed x3 activation (N, T, V, S*C) in, the aggregated (N, T, V, C) out,
    plus the small x1/x2/w4/A operands, at the chip's HBM bandwidth.
  * VPU-issue-bound — the roll-diagonal stage 2 performs one elementwise
    FMA per (sample, frame, offset, joint, subset-channel): N*T*V*V*S*C
    MACs on the VPU.
  * MXU-bound — stage 1's (N*S*V*V, R) @ (R, C) refinement matmul:
    N*S*V*V*R*C MACs on the MXU.

Chip numbers: HBM bandwidth from the published TPU spec sheets; issue rates
derived from the bf16 MXU peak (peak = mxus * 128*128 MACs/cycle * clock)
with the VPU modelled as 4 independent (8, 128) FMA ALUs per TensorCore per
cycle — the model of jax-ml.github.io/scaling-book. These are *upper
bounds*: a kernel at 100% would be issuing a useful full-width op every
cycle of the binding unit with perfect DMA overlap.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_bw: float  # bytes/s
    clock: float  # Hz
    mxus: int  # 128x128 MXUs per TensorCore
    vpu_alus: int = 4  # (8,128) FMA ALUs per TensorCore

    @property
    def mxu_macs_per_s(self) -> float:
        return self.mxus * 128 * 128 * self.clock

    @property
    def vpu_macs_per_s(self) -> float:
        return self.vpu_alus * 8 * 128 * self.clock


# per-generation table (device_kind substring -> spec)
CHIP_SPECS = {
    # v5e: 197 bf16 TFLOP/s = 4 MXUs * 16384 MACs * 2 * 1.5 GHz; 819 GB/s
    "v5 lite": ChipSpec("v5e", hbm_bw=819e9, clock=1.5e9, mxus=4),
    "v5e": ChipSpec("v5e", hbm_bw=819e9, clock=1.5e9, mxus=4),
    # v4: 275 bf16 TFLOP/s, 1228 GB/s, 4 MXUs @ ~1.05 GHz
    "v4": ChipSpec("v4", hbm_bw=1228e9, clock=1.05e9, mxus=4),
    # v5p: 459 bf16 TFLOP/s, 2765 GB/s, 4 MXUs @ ~1.75 GHz
    "v5p": ChipSpec("v5p", hbm_bw=2765e9, clock=1.75e9, mxus=4),
    # v6e (Trillium): 918 bf16 TFLOP/s, 1640 GB/s, 8 MXUs @ ~1.75 GHz
    "v6 lite": ChipSpec("v6e", hbm_bw=1640e9, clock=1.75e9, mxus=8),
    "v6e": ChipSpec("v6e", hbm_bw=1640e9, clock=1.75e9, mxus=8),
}


def detect_chip(default: str = "v5e") -> ChipSpec:
    """ChipSpec for jax.devices()[0] (falls back to `default`)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return spec
    return CHIP_SPECS[default]


def unit_ctr_gc_sol(
    n: int, t: int, v: int, c: int, r: int, s: int = 3,
    itemsize: int = 4, spec: ChipSpec | None = None,
) -> dict:
    """Speed-of-light seconds (and per-floor breakdown) for one unit CTR-GC
    call at the given shape. Returns {'t_sol', 't_mem', 't_vpu', 't_mxu',
    'bound', 'spec'}."""
    spec = spec or detect_chip()
    bytes_hbm = itemsize * (
        n * t * v * s * c  # packed x3 in
        + n * t * v * c    # aggregated out
        + 2 * n * s * v * r  # x1, x2
        + s * (r * c + c + v * v)  # w4, b4, A
    )
    t_mem = bytes_hbm / spec.hbm_bw
    t_vpu = (n * t * v * v * s * c) / spec.vpu_macs_per_s
    t_mxu = (n * s * v * v * r * c) / spec.mxu_macs_per_s
    t_sol = max(t_mem, t_vpu, t_mxu)
    bound = {t_mem: "hbm", t_vpu: "vpu", t_mxu: "mxu"}[t_sol]
    return {
        "t_sol": t_sol, "t_mem": t_mem, "t_vpu": t_vpu, "t_mxu": t_mxu,
        "bound": bound, "spec": spec,
    }
