"""CCD++ — compiled hybrid dense+ELL backend (the large-matrix flagship).

The TPU-native answer for matrices whose full dense residual exceeds HBM
(Netflix-100M: 480k x 17.7k bf16 residual+mask ≈ 34 GB) but whose degree
distribution is heavily skewed, as every real rating dataset's is. The pure
padded-ELL path is bound by the measured ~0.3 G rows/s gather-issue rate —
per rank it must move each rating's factor value through a gather, so its
ceiling is ~`0.3e9 / gather_passes` rating-updates/s no matter how large the
MXU is. The fix is to stop gathering for the rows that carry most of the
ratings:

  * the **top-D highest-degree users** get a dense residual sub-block
    ``Rd (D, n)`` + bf16 mask, processed with the dense backend's
    deferred-subtract matvec schedule (solvers/ccd_dense.py) — HBM/MXU-bound,
    ~25-500x the per-rating rate of gathers;
  * the **light tail** keeps the degree-bucketed lane-packed ELL layout
    (data/ell.py) with the gather-fused sweep schedule of solvers/ccd_ell.py.

Per item j the sweep sum splits over the two disjoint user sets
(RankOneUpdate, /root/reference/src/CCD.cpp:6-16):

    v_j = (g_dense_j + g_ell_j) / (λ·nnz_j + h_dense_j + h_ell_j)

with nnz_j the item's TOTAL degree (λ·nnz scaling, src/CCD.cpp:112,120) —
so the result is bit-for-bit the same algorithm as the other backends, just
with the Ω_j reduction partitioned. Item factors live in ELL slot space
(``Hs``); the dense part's per-item partials are permuted slot↔entity with
two tiny (n-sized) gathers per rank — noise next to the O(nnz) work.

The reference role being replaced is the CUDA CCD++ kernel set
(/root/reference/cuda_src/CCD_CUDA.cu:24-104); the reference has no
counterpart for the split — it is a TPU-roofline-driven design (the gather
wall does not exist on a pointer-chasing GPU SM).

Semantics preserved (SURVEY.md §7): H zeroed at entry (src/CCD.cpp:56-60);
λ·nnz regularization with the entity's total degree; v-sweep before u-sweep
per inner iteration (src/CCD.cpp:110-121); empty entity → 0 factor
(src/CCD.cpp:8); rank-major factor layout. Deferred-subtract schedule on
BOTH parts: rank t's new outer product is subtracted from the dense block
and the ELL cols-side during rank t+1's fused add-back pass (u_pend/v_pend
state), and immediately on the ELL rows-side where the sweep's gather is
reused (same as ccd_ell.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.ell import EllPair, build_ell_pair
from ..data.sparse import RatingMatrix, TestCOO, from_coo
from ..eval.metrics import calrmse_device, default_eval_chunk
from ..ops.ell_ops import extend_zero, residual_update, sweep_partials
from .pipeline import pipelined_loop
from .reference import IterStats


@dataclasses.dataclass(frozen=True)
class HybridPlan:
    """Host-side split plan: which users are dense, the light-tail ELL pair,
    and the slot/entity permutations the device step needs."""

    D: int                      # dense rows incl. padding (multiple of 8)
    D_real: int                 # actual dense users
    dense_ids: np.ndarray       # (D_real,) original user ids, dense order
    light_ids: np.ndarray       # (m_light,) original user ids, light order
    ell: EllPair                # light sub-matrix (m_light x n), both sides
    Rd: np.ndarray              # (D, n) dense residual init (ratings)
    Md: np.ndarray              # (D, n) f32 {0,1} mask
    row_nnz_d: np.ndarray       # (D,) dense-user degrees (0 for padding)
    tot_nnz_c: np.ndarray       # (n_item_slots,) TOTAL item degree per slot
    slot_of_item: np.ndarray    # (n,) item entity -> slot
    item_of_slot_safe: np.ndarray  # (n_item_slots,) slot -> entity (pad -> n)
    user_eval_idx: np.ndarray   # (m,) user -> column in concat([Wd, Wl])


def _ragged_take(ptr: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Flat nnz positions of CSR rows ``ids``: vectorized ragged gather."""
    starts = ptr[ids]
    counts = (ptr[ids + 1] - starts).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.repeat(starts - offs, counts) + np.arange(total)


def plan_hybrid(R: RatingMatrix, cfg: Config) -> HybridPlan:
    """Split users by degree: the top-D fill the dense cell budget
    (``cfg.hybrid_dense_cells``), the rest go to ELL."""
    m, n = R.rows, R.cols
    deg = R.row_nnz.astype(np.int64)
    D_real = int(min(m, cfg.hybrid_dense_cells // max(1, n)))
    order = np.argsort(-deg, kind="stable").astype(np.int64)
    dense_ids, light_ids = order[:D_real], order[D_real:]
    D = D_real + ((-D_real) % 8)               # sublane-align the dense block

    # dense sub-block
    Rd = np.zeros((D, n), dtype=np.float32)
    Md = np.zeros((D, n), dtype=np.float32)
    if D_real:
        pos = _ragged_take(R.csr_ptr, dense_ids)
        rows_rep = np.repeat(np.arange(D_real), deg[dense_ids])
        Rd[rows_rep, R.csr_idx[pos]] = R.csr_val[pos]
        Md[rows_rep, R.csr_idx[pos]] = 1.0
    row_nnz_d = np.zeros(D, np.float32)
    row_nnz_d[:D_real] = deg[dense_ids]

    # light sub-matrix (all n items kept — items with no light ratings land
    # in the cols-side empty tail but still get slots for their factors)
    pos_l = _ragged_take(R.csr_ptr, light_ids)
    rows_l = np.repeat(np.arange(len(light_ids)), deg[light_ids])
    R_light = from_coo(len(light_ids), n, rows_l, R.csr_idx[pos_l],
                       R.csr_val[pos_l])
    ell = build_ell_pair(R_light, min_width=cfg.ell_min_width, num_shards=1)
    cols, rows = ell.cols_side, ell.rows_side

    tot_nnz_c = cols.spread(R.col_nnz.astype(np.float32))
    item_of_slot_safe = np.where(cols.entity_of_slot < 0, n,
                                 cols.entity_of_slot).astype(np.int32)

    user_eval_idx = np.zeros(m, np.int32)
    user_eval_idx[dense_ids] = np.arange(D_real, dtype=np.int32)
    user_eval_idx[light_ids] = D + rows.slot_of_entity[
        np.arange(len(light_ids))]
    return HybridPlan(D=D, D_real=D_real, dense_ids=dense_ids,
                      light_ids=light_ids, ell=ell, Rd=Rd, Md=Md,
                      row_nnz_d=row_nnz_d, tot_nnz_c=tot_nnz_c,
                      slot_of_item=cols.slot_of_entity.astype(np.int32),
                      item_of_slot_safe=item_of_slot_safe,
                      user_eval_idx=user_eval_idx)


def make_hybrid_outer_step(plan: HybridPlan, lam: float, maxinneriter: int,
                           residual_dtype=jnp.float32, jit_compile=True):
    """One outer iteration over all k ranks (lax.fori_loop), both parts."""
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    lam_ = jnp.float32(lam)
    have_dense = plan.D > 0
    have_light = plan.ell.nnz > 0
    rdt = residual_dtype

    def step(idx_r, idx_c, Rd, mask, vals_r, vals_c, Wd, Wl, Hs,
             u_pend_d, u_pend_l, v_pend_s,
             row_nnz_d, rnnz_r, tot_nnz_c, slot_of_item, item_of_slot_safe):
        f32 = jnp.float32

        def to_entity(x_s):        # item slots -> entity order (n,)
            return x_s[slot_of_item]

        def to_slots(x_e):         # entity order (n,) -> item slots (pad 0)
            return jnp.concatenate([x_e, jnp.zeros(1, x_e.dtype)])[
                item_of_slot_safe]

        def rank_body(t, carry):
            (Rd, vals_r, vals_c, Wd, Wl, Hs,
             u_pend_d, u_pend_l, v_pend_s) = carry
            u_old_d = jax.lax.dynamic_slice_in_dim(Wd, t, 1, 0)[0]
            u_old_l = jax.lax.dynamic_slice_in_dim(Wl, t, 1, 0)[0]
            v_old_s = jax.lax.dynamic_slice_in_dim(Hs, t, 1, 0)[0]

            if have_dense:
                # fused deferred-subtract + add-back, ONE residual pass
                # (ccd_dense.py schedule; in oiter 1 H[t]==0 → add-back is a
                # no-op, so one compiled step covers all iterations)
                v_old_e = to_entity(v_old_s)
                v_pend_e = to_entity(v_pend_s)
                delta = (jnp.outer(u_old_d, v_old_e)
                         - jnp.outer(u_pend_d, v_pend_e))
                Rd = Rd + (delta * mask.astype(delta.dtype)).astype(rdt)

            u_d, u_l = u_old_d, u_old_l
            v_s = v_old_s
            vg = None
            for i in range(maxinneriter):
                # ---- v-sweep (items): ELL partials off ONE stacked
                # [u_pend_l, u_old_l] gather (deferred subtract + add-back +
                # sweep, as in ccd_ell.py), plus dense matvec partials ----
                if have_light:
                    if i == 0:
                        stacked_c = extend_zero(
                            jnp.stack([u_pend_l, u_old_l], axis=-1))
                        Gc = [stacked_c[ix] for ix in idx_c]
                        vals_c = residual_update(
                            idx_c, vals_c, cols, None, v_pend_s, -1.0,
                            gathered=[g[..., 0] for g in Gc])
                        vals_c = residual_update(
                            idx_c, vals_c, cols, None, v_old_s, +1.0,
                            gathered=[g[..., 1] for g in Gc])
                        g_l, h_l, _ = sweep_partials(
                            idx_c, vals_c, cols, None,
                            gathered=[g[..., 1] for g in Gc])
                    else:
                        g_l, h_l, _ = sweep_partials(idx_c, vals_c, cols,
                                                     extend_zero(u_l))
                else:
                    g_l = h_l = jnp.zeros(cols.n_slots, f32)
                if have_dense:
                    g_d = jnp.einsum("m,mn->n", u_d, Rd.astype(f32),
                                     preferred_element_type=f32)
                    h_d = jnp.einsum("m,mn->n", u_d * u_d,
                                     mask.astype(f32),
                                     preferred_element_type=f32)
                    g_s = g_l + to_slots(g_d)
                    h_s = h_l + to_slots(h_d)
                else:
                    g_s, h_s = g_l, h_l
                # guard on the FULL denominator (like ccd_dense._half_sweep):
                # covers empty entities (src/CCD.cpp:8) AND the degenerate
                # λ=0 fully-explained-residual case where h underflows to 0
                den_v = lam_ * tot_nnz_c + h_s
                v_s = jnp.where(den_v > 0, g_s / den_v, 0.0)

                # ---- u-sweep (users, both parts) ----
                if have_light:
                    if i == 0:
                        # one stacked row-gather serves add-back (v_old) and
                        # the sweep (v_new); the sweep's gather is reused by
                        # the immediate rows-side subtract after writeback
                        stacked_r = extend_zero(
                            jnp.stack([v_old_s, v_s], axis=-1))
                        Gr = [stacked_r[ix] for ix in idx_r]
                        vals_r = residual_update(
                            idx_r, vals_r, rows, None, u_old_l, +1.0,
                            gathered=[g[..., 0] for g in Gr])
                        g_lr, h_lr, vg = sweep_partials(
                            idx_r, vals_r, rows, None,
                            gathered=[g[..., 1] for g in Gr])
                    else:
                        g_lr, h_lr, vg = sweep_partials(idx_r, vals_r, rows,
                                                        extend_zero(v_s))
                    den_l = lam_ * rnnz_r + h_lr
                    u_l = jnp.where(den_l > 0, g_lr / den_l, 0.0)
                if have_dense:
                    v_e = to_entity(v_s)
                    g_dr = jnp.einsum("mn,n->m", Rd.astype(f32), v_e,
                                      preferred_element_type=f32)
                    h_dr = jnp.einsum("mn,n->m", mask.astype(f32),
                                      v_e * v_e,
                                      preferred_element_type=f32)
                    den_d = lam_ * row_nnz_d + h_dr
                    u_d = jnp.where(den_d > 0, g_dr / den_d, 0.0)

            # ---- write back (src/CCD.cpp:128-134); ELL rows-side subtract
            # immediately (reuses the sweep's gather of v), everything else
            # deferred via the pend state ----
            Wd = jax.lax.dynamic_update_slice_in_dim(Wd, u_d[None], t, 0)
            Wl = jax.lax.dynamic_update_slice_in_dim(Wl, u_l[None], t, 0)
            Hs = jax.lax.dynamic_update_slice_in_dim(Hs, v_s[None], t, 0)
            if have_light:
                vals_r = residual_update(idx_r, vals_r, rows, None, u_l,
                                         -1.0, gathered=vg)
            return (Rd, vals_r, vals_c, Wd, Wl, Hs, u_d, u_l, v_s)

        k = Wd.shape[0]
        return jax.lax.fori_loop(
            0, k, rank_body,
            (Rd, vals_r, vals_c, Wd, Wl, Hs, u_pend_d, u_pend_l, v_pend_s))

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(2, 4, 5, 6, 7, 8, 9, 10, 11))


def ccd_hybrid_train(R: RatingMatrix, W0: np.ndarray, H0: np.ndarray,
                     T: TestCOO, cfg: Config, *,
                     callback: Optional[Callable[[IterStats], None]] = None,
                     plan: Optional[HybridPlan] = None,
                     ckpt_every: int = 0, ckpt_fn=None, resume=None,
                     ) -> tuple[np.ndarray, np.ndarray, list[IterStats]]:
    """Train CCD++ on the hybrid dense+ELL backend (single device). Returns
    (W, H, stats) in the reference's rank-major entity order. Checkpoint
    payloads carry the dense residual, both ELL residual value sets, both
    factor parts, and the pending outer product (all of it is training
    state, src/CCD.cpp:100-134)."""
    if plan is None:
        plan = plan_hybrid(R, cfg)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    rdt = jnp.dtype(cfg.residual_dtype)
    k = W0.shape[0]

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)

    W0 = np.asarray(W0, np.float32)
    start_oiter = 1
    if resume is not None:
        start_oiter = int(resume["oiter"]) + 1
        Rd = jnp.asarray(np.asarray(resume["Rhat"]).astype(rdt))
        Wd = jnp.asarray(resume["W"])
        Wl = jnp.asarray(resume["Wl"])
        Hs = jnp.asarray(resume["H"])
        u_pend_d = jnp.asarray(resume["u_pend_d"])
        u_pend_l = jnp.asarray(resume["u_pend_l"])
        v_pend_s = jnp.asarray(resume["v_pend_s"])
        vals_r = tuple(jnp.asarray(resume[f"vals_r_{i}"])
                       for i in range(len(rows.buckets)))
        vals_c = tuple(jnp.asarray(resume[f"vals_c_{i}"])
                       for i in range(len(cols.buckets)))
    else:
        Rd = jnp.asarray(plan.Rd.astype(rdt))
        # user factors: dense part in dense order, light part in slot space
        Wd_np = np.zeros((k, plan.D), np.float32)
        Wd_np[:, :plan.D_real] = W0[:, plan.dense_ids]
        Wl_np = np.zeros((k, rows.n_slots), np.float32)
        Wl_np[:, rows.slot_of_entity] = W0[:, plan.light_ids]
        Wd, Wl = jnp.asarray(Wd_np), jnp.asarray(Wl_np)
        Hs = jnp.zeros((k, cols.n_slots), jnp.float32)  # src/CCD.cpp:56-60
        u_pend_d = jnp.zeros(plan.D, jnp.float32)
        u_pend_l = jnp.zeros(rows.n_slots, jnp.float32)
        v_pend_s = jnp.zeros(cols.n_slots, jnp.float32)
        vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
        vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)

    mask = jnp.asarray(plan.Md.astype(jnp.bfloat16))    # {0,1} exact in bf16
    row_nnz_d = jnp.asarray(plan.row_nnz_d)
    rnnz_r = jnp.asarray(rows.slot_nnz)
    tot_nnz_c = jnp.asarray(plan.tot_nnz_c)
    slot_of_item = jnp.asarray(plan.slot_of_item)
    item_of_slot_safe = jnp.asarray(plan.item_of_slot_safe)

    ti = jnp.asarray(plan.user_eval_idx[T.row_idx])
    tj = jnp.asarray(plan.slot_of_item[T.col_idx])
    tv = jnp.asarray(T.val)

    step_fn = make_hybrid_outer_step(plan, cfg.lambda_, cfg.maxinneriter,
                                     residual_dtype=rdt)
    chunk = default_eval_chunk(T.nnz, cfg.eval_chunk)

    @jax.jit
    def rmse_fn(ti, tj, tv, Wd, Wl, Hs):
        W = jnp.concatenate([Wd, Wl], axis=1)
        return calrmse_device(ti, tj, tv, W, Hs, entity_major=False,
                              chunk=chunk)

    box = {"s": (Rd, vals_r, vals_c, Wd, Wl, Hs,
                 u_pend_d, u_pend_l, v_pend_s)}

    def do_step():
        (Rd, vals_r, vals_c, Wd, Wl, Hs, upd, upl, vps) = box["s"]
        box["s"] = step_fn(idx_r, idx_c, Rd, mask, vals_r, vals_c, Wd, Wl,
                           Hs, upd, upl, vps, row_nnz_d, rnnz_r, tot_nnz_c,
                           slot_of_item, item_of_slot_safe)

    def do_rmse():
        (_, _, _, Wd, Wl, Hs, _, _, _) = box["s"]
        return rmse_fn(ti, tj, tv, Wd, Wl, Hs)

    def get_payload():
        (Rd, vals_r, vals_c, Wd, Wl, Hs, upd, upl, vps) = box["s"]
        payload = {"W": np.asarray(Wd), "H": np.asarray(Hs),
                   "Wl": np.asarray(Wl), "Rhat": np.asarray(Rd),
                   "u_pend_d": np.asarray(upd), "u_pend_l": np.asarray(upl),
                   "v_pend_s": np.asarray(vps)}
        for i, v_ in enumerate(vals_r):
            payload[f"vals_r_{i}"] = np.asarray(v_)
        for i, v_ in enumerate(vals_c):
            payload[f"vals_c_{i}"] = np.asarray(v_)
        return payload

    stats = pipelined_loop(
        start_oiter=start_oiter, maxiter=cfg.maxiter,
        fuse=cfg.fused_outer_iters, do_step=do_step, do_rmse=do_rmse,
        callback=callback, ckpt_every=ckpt_every, ckpt_fn=ckpt_fn,
        get_payload=get_payload)

    (_, _, _, Wd, Wl, Hs, _, _, _) = box["s"]
    W_ent = np.zeros((k, R.rows), np.float32)
    W_ent[:, plan.dense_ids] = np.asarray(Wd)[:, :plan.D_real]
    W_ent[:, plan.light_ids] = np.asarray(Wl)[:, rows.slot_of_entity]
    H_ent = np.asarray(Hs)[:, cols.slot_of_entity]
    return W_ent, H_ent, stats
