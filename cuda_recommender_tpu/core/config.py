"""Training configuration.

Carries the same semantic knob set as the reference's ``parameter`` class
(/root/reference/src/pmf.h:8-43) and its CLI (/root/reference/src/extras.cpp:68-141),
re-expressed for the TPU runtime: the CUDA launch-geometry knobs (nBlocks,
nThreadsPerBlock) become ELL/block-shape knobs, and the backend toggles
(-CUDA/-OMP) become ``backend`` / ``golden`` (run the compiled path, the reference
path, or both with cross-validation).

Reference quirks preserved deliberately:
  * ``maxinneriter`` defaults to 1 (the code default at src/pmf.h:31, not the help
    text's claimed 5 at src/extras.cpp:54).
  * ``eps`` exists but no solver consumes it (dead in the reference too);
    ``do_predict`` only forces ``verbose`` (src/extras.cpp:130-132).
  * ``do_nmf`` (-N) is parsed-but-dead in the reference (src/pmf.h:33, no use
    anywhere in src/). HERE it is implemented with the original libpmf CCD++
    semantics the flag was copied from: every rank-one update is clamped at 0,
    giving nonnegative factors. CCD++ only — the reference/libpmf ALS has no
    NMF path, so ALS ignores it like the reference does.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class Solver(str, enum.Enum):
    CCD = "ccd"
    ALS = "als"


class Backend(str, enum.Enum):
    #: NumPy loop-faithful golden implementation (the reference-OMP role).
    REF = "ref"
    #: Compiled XLA dense-residual path (CCD) — the single-chip flagship.
    DENSE = "dense"
    #: Dense-residual path with the Pallas fused update+sweep kernel (CCD,
    #: single chip). Opt-in: measured on v5e it matches XLA per-pass but XLA
    #: wins end-to-end through cross-op fusion (ARCHITECTURE.md).
    PALLAS = "pallas"
    #: Compiled XLA padded-ELL path (general sparse; the only ALS compiled path).
    ELL = "ell"
    #: Hybrid dense+ELL path (CCD, single chip): top-degree users get a dense
    #: residual sub-block (MXU/HBM-bound), the light tail stays padded-ELL.
    #: The large-matrix flagship — beats pure ELL by moving most ratings off
    #: the ~0.3 G rows/s gather path (solvers/ccd_hybrid.py).
    HYBRID = "hybrid"
    #: Pick the dense-residual path for CCD when it fits, the hybrid path for
    #: larger matrices (single device), ELL otherwise.
    AUTO = "auto"


@dataclasses.dataclass
class Config:
    # --- solver semantics (reference parity) ---
    solver: Solver = Solver.CCD            # -ALS flag flips to ALS
    k: int = 10                            # -k rank (src/pmf.h:27)
    maxiter: int = 5                       # -t outer iterations (src/pmf.h:30)
    maxinneriter: int = 1                  # -T inner iterations (src/pmf.h:31)
    lambda_: float = 0.1                   # -l regularization (src/pmf.h:33)
    eps: float = 1e-3                      # -e; inert unless early_stop is set
    #: Opt-in convergence stop (OFF = reference parity: the reference parses
    #: -e but never consumes it, src/pmf.h:32). When set, training ends once
    #: an outer iteration improves test RMSE by less than eps relative.
    early_stop: bool = False
    do_predict: bool = False               # -p; forces verbose (parity)
    verbose: bool = False                  # -q
    do_nmf: bool = False                   # -N; nonnegative CCD++ (libpmf semantics)
    threads: int = 4                       # -n; meaningless on TPU, kept for parity

    # --- TPU runtime knobs (replace nBlocks/nThreadsPerBlock) ---
    backend: Backend = Backend.AUTO
    golden: bool = False                   # run REF too and golden_compare
    seed: int = 0                          # factor init seed (reference: srand(0))
    residual_dtype: str = "float32"        # dense CCD residual dtype ("bfloat16" ok)
    #: Outer iterations fused into one device dispatch (dense CCD). Each
    #: dispatch costs ~27 ms on a tunneled chip (and ~10s of µs locally);
    #: fusing amortizes it. Per-iteration RMSE is still computed (on device)
    #: and reported — only live per-iteration wall-timing coarsens.
    fused_outer_iters: int = 1
    #: Phase-split telemetry mode (CCD dense/ell, single device): dispatch
    #: each rank's add-back / sweeps / subtract as separate fenced device
    #: calls so the iteration line's rank_time/update_time split carries real
    #: measurements (the reference's per-phase timers, src/CCD.cpp:76-139).
    #: Slower than the fused default — the point is attribution, not speed.
    #: With ``verbose`` it also prints per-rank residual RMSE (the
    #: reference's commented calrmse_r1 path, src/CCD.cpp:141-148).
    phase_timing: bool = False
    ell_min_width: int = 8                 # narrowest ELL bucket width (pow2)
    #: ALS bucket floor. Sub-128-lane buckets leave VPU/MXU lanes idle in the
    #: gram einsums; measured at ml20M k=40: width 128 is ~12% faster than 8
    #: despite 12% more padding. CCD keeps ell_min_width (gather-bound, pays
    #: for padding directly). "auto" (the r5 default): each side picks the
    #: largest floor in {128..8} that pads <= 1.3x that side's true nnz
    #: (data/ell.py auto_min_width) — keeps 128 at ml20M (pads 1.12x) but
    #: drops to 16-32 at wide geometries like yahoo-r1, whose avg user
    #: degree of 59 made a fixed 128 floor pad 4.5x
    #: (results/yahoo_robustness_r4.jsonl als_r1, VERDICT r4 next #3).
    als_min_width: int | str = "auto"
    #: hybrid stair orientation (VERDICT r4 next #4). False = the classic
    #: stair (panels over top-USERS x item prefixes). True = plan and run
    #: on the TRANSPOSED matrix (panels over top-items x user prefixes) —
    #: covers more nnz at equal budget when the item marginal is flatter
    #: than the user marginal (yahoo-c15: 1M x 625k, 42.2% tail under the
    #: classic stair). "auto" = geometry-plan BOTH orientations and keep
    #: the one with the smaller uncovered tail (costs one extra plan pass,
    #: no device work). Transposed runs seed the ITEM side and sweep users
    #: first — the same CCD++ family on R^T; golden parity is against the
    #: reference run on the transposed problem. Single-device hybrid only.
    hybrid_transpose: bool | str = False
    #: per-group HBM temp budget (MB) for the grouped ALS gram assembly +
    #: solve (solvers/als_ell._row_groups): bounds the materialized
    #: augmented gather and batch-last gram per lax.map group. 2048 MB is
    #: the measured ml20M sweet spot; huge low-degree sides (yahoo-r1
    #: rows: 1.9M slots) may need less headroom when the bucket floor
    #: shrinks (more slots per group at equal bytes).
    als_group_mb: int = 2048
    #: gather-cliff tiling threshold (MB). Factor-row gathers run ~3.6
    #: ns/lane while the gather table is <= ~32 MB and 12.6x slower above
    #: ~64 MB (results/als_gather_cliff_r5.json). An ALS side whose OTHER
    #: side's table exceeds this gathers per <= threshold-sized table tile
    #: (solvers/als_ell.build_side_gather_tiles; p==1 buckets). 0 disables
    #: (the pre-r5 behavior). Single-device ALS only.
    als_gather_tile_mb: float = 32
    #: ALS gram-assembly matmul precision. "highest" = true f32 (6-pass
    #: bf16 emulation on the MXU) — the golden-grade default. "high" =
    #: 3-pass bf16x3, measured ~26% faster end-to-end at ml20M k=40 with
    #: near-f32 accuracy. "default" = single-pass bf16 — fastest MXU rate
    #: but drifts ~0.4%/solve AND pays conversion passes on the gathered
    #: tiles (measured slower end-to-end than highest; kept for experiments).
    als_precision: str = "highest"
    #: k×k solve implementation: "gj" (VMEM-blocked Pallas Gauss-Jordan —
    #: fastest), "gj_xla" (the same elimination as XLA ops; HBM-bound), or
    #: "lax" (cholesky + triangular solves; slowest on TPU).
    als_solver: str = "gj"
    ell_chunk: int = 512                   # ALS gram scan chunk along the width axis
    eval_chunk: int = 1 << 20              # test-RMSE gather chunk
    dense_max_cells: int = 2_000_000_000   # AUTO picks DENSE below this m*n
    #: Hybrid backend: TOTAL cell budget for the dense panel stair (top
    #: users x all items, next users x top-w items, ...). Default 2e9 cells
    #: ≈ 8 GB at bf16 residual + bf16 mask — sized for one 16 GB v5e with
    #: ELL buffers, factors and the test set resident.
    hybrid_dense_cells: int = 2_000_000_000
    #: Widths (top-item counts) of the secondary dense panels; the first
    #: panel always spans all items. The planner grid-searches the user
    #: boundaries per width to maximize covered nnz under the cell budget.
    #: The string "auto" chooses widths AND boundaries jointly from the
    #: degree distribution (Lagrangian stair search,
    #: solvers/ccd_hybrid._auto_stair) — the DEFAULT, justified by the r4
    #: Netflix-100M A/B grid (results/sweep_netflix_hybrid_r4.jsonl): at
    #: the default 2e9-cell budget auto covers 83.1% vs the hand stair's
    #: 68.2% and runs 1.9x faster (7.6 vs 14.1 s/iter, k=40); at 4.2e9 it
    #: ties. At large budgets a FEW-panel hand stair wins on dispatch
    #: count (6.5e9: hand (4096,2048) 3.90 vs auto-8-panel 4.35 s/iter) —
    #: bench.py pins the measured winner for its headline config; tuples
    #: remain for explicit control and parity tests.
    hybrid_panel_widths: tuple = "auto"
    #: Max distinct panel widths the auto stair may emit (each panel adds a
    #: scatter program + a kernel call set per rank to the traced program).
    hybrid_max_panels: int = 8
    #: Panel mask storage dtype: "bfloat16" (default), "int8", or "nan".
    #: {0,1} is exact in bfloat16/int8, so numerics are identical; int8
    #: halves the mask's HBM footprint, buying a ~33% larger in-HBM panel
    #: budget. Measured: at an EQUAL budget int8 is ~4% slower (the convert
    #: pass costs more than the bandwidth it saves) — the knob pays via
    #: budget, not bandwidth. "nan" stores NO mask array at all: unobserved
    #: panel cells hold a NaN sentinel in the residual itself (NaN + delta
    #: = NaN keeps them inert through updates; sweeps read the mask as
    #: isnan(Rd) in-register), cutting panel storage to residual-only —
    #: a bf16 residual fits a 6.5e9-cell stair (~97% Netflix-100M
    #: coverage) in 13 GB with bit-exact {0,1} mask numerics.
    mask_dtype: str = "bfloat16"
    #: Run the hybrid backend's dense-panel passes through the fused Pallas
    #: kernels (ops/panel_pallas.py): update + v-sweep partials in ONE
    #: read-modify-write pass, u-sweep partials in ONE read pass — half the
    #: XLA schedule's panel HBM traffic. Requires mask_dtype="nan" (the
    #: kernels derive the mask from the NaN sentinel in-register) and the
    #: single-device hybrid path. Panels are allocated block-padded.
    hybrid_panel_kernel: bool = False
    #: Rank-deferral group G for the hybrid ELL tail (0 = off, the
    #: default): residual lanes stay frozen for G ranks, sweeps run as
    #: (2G+1)-wide single-fusion gather-reduces with algebraic corrections,
    #: lanes flushed once per group (ops/ell_ops.deferred_sweep/
    #: deferred_flush). Measured at Netflix-100M the deferred tail lands
    #: WITHIN the same gather-issue wall as the per-rank fused path
    #: (41.5 vs 38.6 ms/rank -- results/tail_floor_r4.json: every tail
    #: schedule is bound by ~3.3-4.6 ns/gathered-lane; the round-3 design
    #: already sits at ~92% of that wall), so it stays opt-in as the
    #: floor-proof experiment, not the default.
    hybrid_defer_group: int = 0

    # --- io ---
    data_dir: Optional[str] = None         # positional data_dir (reference CLI)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0              # 0 = off; else every N outer iters
    metrics_file: Optional[str] = None     # JSONL metrics sink

    def __post_init__(self) -> None:
        self.solver = Solver(self.solver)
        self.backend = Backend(self.backend)
        if self.do_predict:
            self.verbose = True            # src/extras.cpp:130-132
        if self.k <= 0:
            raise ValueError("rank k must be positive")
        if self.maxiter < 0 or self.maxinneriter <= 0:
            raise ValueError("iteration counts must be positive")
        if self.ell_min_width & (self.ell_min_width - 1):
            raise ValueError("ell_min_width must be a power of two")
        if isinstance(self.als_min_width, str):
            if self.als_min_width != "auto":
                raise ValueError("als_min_width must be 'auto' or a power "
                                 f"of two, got {self.als_min_width!r}")
        elif self.als_min_width & (self.als_min_width - 1):
            raise ValueError("als_min_width must be 'auto' or a power of two")
        if self.als_group_mb <= 0:
            raise ValueError("als_group_mb must be positive")
        if self.als_gather_tile_mb < 0:
            raise ValueError("als_gather_tile_mb must be >= 0 (0 disables)")
        if self.hybrid_transpose not in (False, True, "auto"):
            raise ValueError("hybrid_transpose must be False, True or "
                             f"'auto', got {self.hybrid_transpose!r}")
        if self.ell_chunk < 128 or (self.ell_chunk & (self.ell_chunk - 1)):
            raise ValueError("ell_chunk must be a power of two >= 128 (it "
                             "must divide every ELL bucket width)")
        if self.als_solver not in ("gj", "gj_xla", "lax"):
            raise ValueError(f"als_solver must be 'gj', 'gj_xla' or 'lax', "
                             f"got {self.als_solver!r}")
        if self.als_precision not in ("highest", "high", "default"):
            raise ValueError(f"als_precision must be 'highest', 'high' or "
                             f"'default', got {self.als_precision!r}")
        if self.residual_dtype not in ("float32", "bfloat16",
                                       "float8_e4m3fn"):
            raise ValueError(f"residual_dtype must be 'float32', 'bfloat16' "
                             f"or 'float8_e4m3fn', got "
                             f"{self.residual_dtype!r}")
        if self.mask_dtype not in ("bfloat16", "int8", "nan"):
            raise ValueError(f"mask_dtype must be 'bfloat16', 'int8' or "
                             f"'nan', got {self.mask_dtype!r}")
        if self.hybrid_panel_kernel and self.mask_dtype != "nan":
            raise ValueError("hybrid_panel_kernel requires mask_dtype='nan' "
                             "(the fused kernels read the mask from the "
                             "NaN sentinel)")
        if isinstance(self.hybrid_panel_widths, str):
            if self.hybrid_panel_widths != "auto":
                raise ValueError("hybrid_panel_widths must be a width tuple "
                                 f"or 'auto', got "
                                 f"{self.hybrid_panel_widths!r}")
        else:
            self.hybrid_panel_widths = tuple(
                int(w) for w in self.hybrid_panel_widths)
            if any(w <= 0 for w in self.hybrid_panel_widths):
                raise ValueError("hybrid_panel_widths must be positive")
        if self.hybrid_defer_group < 0:
            raise ValueError("hybrid_defer_group must be >= 0")
        if self.hybrid_max_panels <= 0:
            raise ValueError("hybrid_max_panels must be positive")

    def resolve_backend(self, m: int, n: int) -> Backend:
        """AUTO resolution: dense residual for CCD when it fits (the Pallas
        fused kernel on TPU, plain XLA elsewhere); for larger matrices the
        panel-hybrid path (single-device or sharded — the sharded variant
        row-splits every panel and the ELL tail across the mesh).

        ALS has exactly one compiled path (ELL): an explicit ``dense`` or
        ``pallas`` request normalizes to ELL here so that logs, metrics and
        checkpoint manifests always record the backend that actually ran
        (previously the trainer dispatched ELL while reporting the requested
        name). HYBRID is CCD-only, so it normalizes too."""
        if self.backend != Backend.AUTO:
            if (self.solver == Solver.ALS
                    and self.backend in (Backend.DENSE, Backend.PALLAS,
                                         Backend.HYBRID)):
                return Backend.ELL
            return self.backend
        if self.solver != Solver.CCD:
            return Backend.ELL
        if m * n <= self.dense_max_cells:
            # Measured on v5e: XLA's own fusion of the dense schedule matches
            # the Pallas kernel per-pass (218 vs 198 GB/s) and wins end-to-end
            # because it can fuse across the whole rank body; PALLAS stays an
            # explicit opt-in backend.
            return Backend.DENSE
        if self.hybrid_dense_cells // max(1, n) > 0:
            return Backend.HYBRID
        return Backend.ELL
