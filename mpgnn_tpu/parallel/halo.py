"""Node-sharded aggregation with halo exchange — the BASELINE north star.

Unlike ``edge_partitioned_aggregate`` (edges sharded, node features
replicated, psum of full [N, F] partials), this path shards the NODE
feature array itself across the mesh, so graphs whose node state exceeds
one chip's HBM still train:

* nodes are block-partitioned: device p owns rows [p*S, (p+1)*S);
* each device owns the edges whose aggregation target (source column)
  falls in its block — output rows stay local, no result communication;
* the destination features a device needs from other devices (its halo)
  are exchanged with ONE ``all_to_all`` of statically padded per-pair
  buffers over ICI;
* edges are split into LOCAL (destination owned by the same device) and
  REMOTE: the local partial sum is computed between the halo send and its
  first use, giving XLA's latency-hiding scheduler room to overlap the
  collective with compute (SURVEY §5's "all-to-all boundary exchange
  overlapped with local aggregation").

All shapes are static: the halo plan (per-pair node lists, per-device edge
lists, slot tables) is built host-side once per (graph, relation, mesh
size) in ``build_halo_plan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


class HaloPlan(NamedTuple):
    """Static per-shard structures (leading axis = shard)."""

    num_shards: int
    block: int              # nodes per shard (padded)
    halo_max: int           # per-(q,p) halo buffer rows ('a2a' only; else 0)
    edge_max: int           # per-shard edge capacity
    # [P, E_max] local source row of each edge (aggregation target)
    edge_src_local: jax.Array
    # [P, E_max] slot of each edge's destination in concat(local, halo)
    edge_dst_slot: jax.Array
    edge_mask: jax.Array    # [P, E_max]
    # 'a2a': [P, P, H_max] local row ids this shard sends to each peer;
    # 'ppermute': [P, sum(round_sizes)] round-major send rows (+ mask)
    send_idx: jax.Array
    send_mask: jax.Array
    exchange: str = "a2a"           # 'a2a' | 'ppermute'
    round_sizes: tuple = ()         # per-round buffer rows ('ppermute')
    # [P, P] ACTUAL per-(owner q, reader p) halo rows — host-side
    # accounting only (never shipped to device); see halo_volume()
    pair_rows: object = None


def _pow2(n: int, lo: int = 8) -> int:
    return 1 << (max(n, lo) - 1).bit_length()


def _round128(n: int, lo: int = 8) -> int:
    """Pad halo buffer rows to a multiple of 128 (one lane tile).

    pow2 padding wasted up to 2x of the exchanged ICI volume (the halo
    buffer is P^2*H*F bytes and H entered it pow2-rounded); 128-multiples
    keep rows tile-aligned at <=1% waste for realistic halos. Plans remain
    per-(graph, relation, P) cached, so the lost shape-bucket sharing only
    costs extra compiles when relations' halo sizes differ anyway."""
    return max(-(-max(n, lo) // 128) * 128, lo)


def build_halo_plan(
    src: np.ndarray, dst: np.ndarray, num_nodes: int, num_shards: int,
    exchange: str = "a2a",
) -> HaloPlan:
    """Static halo-exchange plan for one relation over ``num_shards``.

    ``exchange`` picks the collective the aggregation will run:

    * 'a2a' — ONE ``all_to_all`` of uniformly padded per-pair buffers.
      Lowest latency, but every pair pads to the GLOBAL max pair size, so
      one hot pair (power-law skew) inflates the whole P^2*H*F volume.
    * 'ppermute' — P-1 ring rounds; round r moves each shard's buffer to
      peer (p+r)%P, padded to that ROUND's max pair size only. Skewed halos
      ship ~sum_r(P*H_r) bytes instead of P^2*max_r(H_r): the bucketed
      buffer sizing VERDICT r2 asked for, with per-round sizes recorded in
      ``round_sizes`` (static) so every shape stays jit-compatible. The
      self-chunk round (r=0) is skipped entirely — all_to_all ships it as
      payload; the ring never puts it on the wire.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    S = -(-num_nodes // num_shards)
    owner_src = src // S
    owner_dst = dst // S

    # per-(q, p) halo node lists: nodes owned by q that p's edges read
    halo_ids = [[None] * num_shards for _ in range(num_shards)]
    halo_pos = [dict() for _ in range(num_shards)]  # per p: global dst -> slot
    pair_rows = np.zeros((num_shards, num_shards), np.int64)
    for p in range(num_shards):
        sel = owner_src == p
        for q in range(num_shards):
            if q == p:
                halo_ids[q][p] = np.zeros(0, np.int64)
                continue
            need = np.unique(dst[sel & (owner_dst == q)])
            halo_ids[q][p] = need
            pair_rows[q, p] = len(need)

    if exchange == "a2a":
        H = _round128(int(pair_rows.max()))
        round_sizes: tuple = ()
        # q's halo chunk starts at S + q*H on every reader
        chunk_off = lambda p, q: S + q * H  # noqa: E731
    elif exchange == "ppermute":
        H = 0
        # round r (1..P-1): q sends to (q+r)%P; the round's buffer pads to
        # the max pair size WITHIN the round
        round_sizes = tuple(
            _round128(int(max(
                pair_rows[q, (q + r) % num_shards] for q in range(num_shards)
            )))
            for r in range(1, num_shards)
        )
        # r_off[r] = rows before round r's span in the received halo concat
        r_off = np.zeros(num_shards, np.int64)
        if num_shards > 2:
            r_off[2:] = np.cumsum(round_sizes[:-1])
        # on reader p, owner q's chunk sits in round (p-q)%P's span
        chunk_off = lambda p, q: S + int(r_off[(p - q) % num_shards])  # noqa: E731
    else:
        raise ValueError(f"unknown exchange {exchange!r}")

    for p in range(num_shards):
        for q in range(num_shards):
            base = chunk_off(p, q)
            for slot, v in enumerate(halo_ids[q][p]):
                halo_pos[p][int(v)] = base + slot

    counts = np.bincount(owner_src, minlength=num_shards)
    E = _pow2(int(counts.max()) if len(counts) else 1, lo=8)

    e_src = np.zeros((num_shards, E), np.int32)
    e_slot = np.zeros((num_shards, E), np.int32)
    e_mask = np.zeros((num_shards, E), bool)
    for p in range(num_shards):
        sel = np.nonzero(owner_src == p)[0]
        n = len(sel)
        e_src[p, :n] = (src[sel] - p * S).astype(np.int32)
        slots = np.empty(n, np.int32)
        local = owner_dst[sel] == p
        slots[local] = (dst[sel][local] - p * S).astype(np.int32)
        pos = halo_pos[p]
        slots[~local] = np.array(
            [pos[int(v)] for v in dst[sel][~local]], np.int32
        )
        e_slot[p, :n] = slots
        e_mask[p, :n] = True

    if exchange == "a2a":
        send_idx = np.zeros((num_shards, num_shards, H), np.int32)
        send_mask = np.zeros((num_shards, num_shards, H), bool)
        for q in range(num_shards):
            for p in range(num_shards):
                ids = halo_ids[q][p]
                send_idx[q, p, : len(ids)] = (ids - q * S).astype(np.int32)
                send_mask[q, p, : len(ids)] = True
    else:
        tot = int(sum(round_sizes))
        send_idx = np.zeros((num_shards, max(tot, 1)), np.int32)
        send_mask = np.zeros((num_shards, max(tot, 1)), bool)
        off = 0
        for r, hr in enumerate(round_sizes, start=1):
            for q in range(num_shards):
                ids = halo_ids[q][(q + r) % num_shards]
                send_idx[q, off: off + len(ids)] = (ids - q * S).astype(
                    np.int32
                )
                send_mask[q, off: off + len(ids)] = True
            off += hr

    return HaloPlan(
        num_shards=num_shards, block=S, halo_max=H, edge_max=E,
        edge_src_local=jnp.asarray(e_src),
        edge_dst_slot=jnp.asarray(e_slot),
        edge_mask=jnp.asarray(e_mask),
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        exchange=exchange,
        round_sizes=round_sizes,
        pair_rows=pair_rows,
    )


def build_halo_csr_operands(plan: HaloPlan):
    """Per-shard Pallas sorted-CSR blockings for the halo LOCAL aggregation,
    stacked [P, ...] for shard_map.

    The plan's per-shard edge lists feed XLA segment sums by default; at
    north-star scale that is the same scatter wall the csr kernel was built
    to kill (docs/DESIGN.md §2) — and BASELINE.md's projected-ICI table
    anchors per-chip compute to the csr rate, so the halo path should
    actually run it.

    Each shard's edges are SPLIT into a LOCAL blocking (destination owned
    by the shard: rows = its S sources, gather columns = the [S] local
    block) and a HALO blocking (gather columns = the [H] exchanged
    buffer). The mean's 1/deg weights use the TOTAL row degree, so the two
    kernels' outputs simply add. The split is what makes comm/compute
    overlap possible: the local kernel depends only on the shard's own
    feature block and is schedulable DURING the exchange, where the round-3
    formulation ran one rectangular kernel over concat(local, halo) that
    could not start until the last collective round landed (VERDICT r3
    item 4). Shards pad to one common tile count so the stacked arrays
    shard_map cleanly. Returns (statics, arrays):

      statics = (S, halo_rows, local bm, halo bm, edge_tile)
      arrays  = (local fwd gidx/local/weight/tile_block, local bwd ...,
                 halo fwd ..., halo bwd ...), each [P, ...]
    """
    from mpgnn_tpu.ops.pallas_csr import _auto_bm, build_rect_csr_blocking

    P, S = plan.num_shards, plan.block
    if plan.exchange == "a2a":
        h_tot = P * plan.halo_max
    else:
        h_tot = int(sum(plan.round_sizes))
    h_tot = max(h_tot, 1)   # the halo buffer needs >=1 row

    e_src = np.asarray(plan.edge_src_local)
    e_slot = np.asarray(plan.edge_dst_slot)
    e_mask = np.asarray(plan.edge_mask)
    worst_e = int(e_mask.sum(axis=1).max()) if e_mask.size else 0
    bm = _auto_bm(S, worst_e)
    loc_blks, halo_blks = [], []
    for p in range(P):
        real = e_mask[p]
        rows = e_src[p][real].astype(np.int64)
        cols = e_slot[p][real].astype(np.int64)
        # mean weights over the TOTAL degree (local + remote edges), so
        # the split kernels' partial sums add to the full mean
        deg = np.bincount(rows, minlength=S).astype(np.float32)
        ew = (1.0 / np.maximum(deg, 1.0))[rows]
        is_local = cols < S
        loc_blks.append(build_rect_csr_blocking(
            rows[is_local], cols[is_local], ew[is_local], S, S, bm=bm,
        ))
        halo_blks.append(build_rect_csr_blocking(
            rows[~is_local], cols[~is_local] - S, ew[~is_local],
            S, h_tot, bm=bm,
        ))

    def pad_stack(parts, n_gather):
        """Stack CsrBlockings padded to one tile count. Pad tiles repeat
        the LAST tile_block id (non-decreasing -> no spurious accumulator
        reset) with zero weights; the +1 gather-index tail stays last.
        ``n_gather`` bounds the spread pad indices: the fwd blockings
        gather from the [S + H] exchanged buffer, the bwd ones from the
        [S] cotangent — OOB pads would clamp onto one row."""
        t_max = max(b.local.shape[0] for b in parts)
        et = parts[0].edge_tile
        out = {"gidx": [], "local": [], "weight": [], "tile_block": []}
        for b in parts:
            t = b.local.shape[0]
            pad_t = t_max - t
            gidx = np.asarray(b.gidx)
            local = np.asarray(b.local)
            weight = np.asarray(b.weight)
            tb = np.asarray(b.tile_block)
            if pad_t:
                # spread pad gather indices over the shard's gather space
                # (zero weight makes the values irrelevant): constant-0 pads
                # would serialize pad_t*et reads on row 0's HBM channel —
                # the exact pathology _build_one_direction's arange-spread
                # pads eliminate (ops/pallas_csr.py, measured ~12% of the
                # gather at 20% padding); skewed meshes pad the SMALL shards
                # hardest, so they would pay it where they can least afford
                tail, body = gidx[-1:], gidx[:-1]
                spread = (np.arange(pad_t * et) % max(n_gather, 1)).astype(
                    np.int32
                )
                gidx = np.concatenate([body, spread, tail])
                local = np.concatenate(
                    [local, np.zeros((pad_t,) + local.shape[1:], np.int32)]
                )
                weight = np.concatenate(
                    [weight, np.zeros(pad_t * et, np.float32)]
                )
                tb = np.concatenate(
                    [tb, np.full(pad_t, tb[-1], np.int32)]
                )
            out["gidx"].append(gidx)
            out["local"].append(local)
            out["weight"].append(weight)
            out["tile_block"].append(tb)
        return tuple(jnp.asarray(np.stack(v)) for v in out.values())

    lf_arrays = pad_stack([f for f, _ in loc_blks], S)
    lb_arrays = pad_stack([b for _, b in loc_blks], S)
    hf_arrays = pad_stack([f for f, _ in halo_blks], h_tot)
    hb_arrays = pad_stack([b for _, b in halo_blks], S)
    et = loc_blks[0][0].edge_tile
    statics = (S, h_tot, bm, bm, et)
    return statics, lf_arrays + lb_arrays + hf_arrays + hb_arrays


def halo_volume(plan: HaloPlan, feat_dim: int, dtype_bytes: int = 4) -> dict:
    """Per-step halo exchange volume accounting (VERDICT r2 item 8).

    ``useful`` counts the rows readers actually consume; ``wire`` what the
    chosen collective puts on ICI per aggregation call (padding included,
    self-chunks excluded for 'ppermute' — all_to_all ships its own chunk as
    local payload, which costs HBM but not ICI, so 'a2a' wire counts only
    the P*(P-1) off-diagonal buffers)."""
    P = plan.num_shards
    useful = int(plan.pair_rows.sum()) if plan.pair_rows is not None else 0
    if plan.exchange == "a2a":
        wire_rows = P * (P - 1) * plan.halo_max
    else:
        wire_rows = P * int(sum(plan.round_sizes))
    return {
        "exchange": plan.exchange,
        "useful_rows": useful,
        "wire_rows": wire_rows,
        "useful_bytes": useful * feat_dim * dtype_bytes,
        "wire_bytes": wire_rows * feat_dim * dtype_bytes,
        "utilization": useful / wire_rows if wire_rows else 1.0,
    }


def pad_node_features(x: np.ndarray, plan: HaloPlan) -> np.ndarray:
    n_pad = plan.num_shards * plan.block
    out = np.zeros((n_pad, x.shape[1]), x.dtype)
    out[: x.shape[0]] = x
    return out


def shard_graph_features(
    x: np.ndarray, mesh: Mesh, axis: str = "nodes"
) -> jax.Array:
    """Pad [N, F] node features to P*ceil(N/P) rows and block-shard them
    along ``axis``. The padded row count matches every ``build_halo_plan``
    for the same (N, P), so one sharded feature array serves all relations'
    plans."""
    from jax.sharding import NamedSharding

    P_n = mesh.shape[axis]
    S = -(-x.shape[0] // P_n)
    out = np.zeros((P_n * S, x.shape[1]), x.dtype)
    out[: x.shape[0]] = np.asarray(x)
    return jax.device_put(out, NamedSharding(mesh, P(axis)))


def halo_sharded_mean_aggregate(
    mesh: Mesh,
    x_sharded: jax.Array,   # [P*S, F], sharded P('nodes') on axis 0
    plan: HaloPlan,
    axis: str = "nodes",
    csr_statics=None,
    csr_arrays=None,
) -> jax.Array:
    """out[i] = mean over edges (i, d) of x[d], with nodes sharded.

    Returns [P*S, F] sharded like the input. Padded rows aggregate to 0.

    The halo EXCHANGE runs in the input dtype (bf16 halves the ICI bytes),
    but both segment accumulations run in f32: a bf16 segment_sum cannot
    represent integer counts >256 (or long feature sums exactly), which made
    means for degree-1000 nodes off by ~50% before the fix.

    plan.exchange='ppermute' replaces the single all_to_all with P-1 ring
    rounds whose buffers pad to PER-ROUND maxima (see build_halo_plan) —
    the skew-robust variant for power-law halos.

    ``csr_statics``/``csr_arrays`` (from ``build_halo_csr_operands``)
    replace the local XLA segment sums with per-shard Pallas sorted-CSR
    kernels — the scatter-free local path for north-star scale — SPLIT
    into a local-block kernel issued before the exchange (no dependence
    on any collective output; overlappable) and a halo-contribution
    kernel over the exchanged buffer (1/total-degree weights in both, so
    the partial sums add to the exact mean)."""
    shard_map = jax.shard_map
    P_n = plan.num_shards

    def local_fn(x_l, e_src, e_slot, e_mask, s_idx, s_mask, *csr_leaves):
        # x_l arrives as this device's [S, F] node block; the plan arrays
        # arrive with a leading per-device axis of size 1 to strip
        e_src, e_slot, e_mask = e_src[0], e_slot[0], e_mask[0]
        s_idx, s_mask = s_idx[0], s_mask[0]

        local_out = lf = lb = hf = hb = None
        if csr_statics is not None:
            # 0. scatter-free LOCAL kernel FIRST: the local blocking
            # depends only on this shard's own [S, F] block, so the
            # latency-hiding scheduler can run it while the collective is
            # in flight (the round-3 concat formulation ran one kernel
            # over concat(local, halo) that could not start until the last
            # exchange round landed). f32 aggregation (kernel exactness).
            from mpgnn_tpu.ops.pallas_csr import (
                CsrBlocking,
                csr_mean_aggregate,
            )

            s_rows, h_tot, bm_l, bm_h, et = csr_statics
            (lfg, lfl, lfw, lftb, lbg, lbl, lbw, lbtb,
             hfg, hfl, hfw, hftb, hbg, hbl, hbw, hbtb) = [
                a[0] for a in csr_leaves
            ]
            lf = CsrBlocking(lfg, lfl, lfw, lftb, s_rows, bm_l, et)
            lb = CsrBlocking(lbg, lbl, lbw, lbtb, s_rows, bm_l, et)
            hf = CsrBlocking(hfg, hfl, hfw, hftb, s_rows, bm_h, et)
            hb = CsrBlocking(hbg, hbl, hbw, hbtb, h_tot, bm_h, et)
            local_out = csr_mean_aggregate(x_l.astype(jnp.float32), lf, lb)

        # 1. build + exchange halo buffers over ICI
        if plan.exchange == "ppermute":
            # P-1 ring rounds, each padded to its OWN max pair size; the
            # received round-r chunk (from peer (p-r)%P) lands at the
            # static offset the slot table was built against
            parts = []
            off = 0
            for r, hr in enumerate(plan.round_sizes, start=1):
                sb = (
                    x_l[s_idx[off: off + hr]]
                    * s_mask[off: off + hr, None].astype(x_l.dtype)
                )
                parts.append(jax.lax.ppermute(
                    sb, axis,
                    perm=[(q, (q + r) % P_n) for q in range(P_n)],
                ))
                off += hr
            halo_flat = (
                jnp.concatenate(parts, axis=0) if parts
                else jnp.zeros((1, x_l.shape[1]), x_l.dtype)
            )
        else:
            send_buf = x_l[s_idx] * s_mask[..., None].astype(x_l.dtype)
            halo = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0, tiled=False
            )                                        # [P, H, F]
            halo_flat = halo.reshape(-1, x_l.shape[1])

        if csr_statics is not None:
            # 2'. halo-contribution kernel over the exchanged buffer; mean
            # weights (1/TOTAL-deg) are folded into both blockings, so the
            # two partial kernels add to the full mean. Only THIS kernel
            # waits on the collective — the local kernel above depends
            # solely on x_l and overlaps the exchange.
            from mpgnn_tpu.ops.pallas_csr import csr_mean_aggregate

            pad_h = hb.num_rows - halo_flat.shape[0]
            if pad_h > 0:     # zero-edge degenerate meshes pad to h_tot
                halo_flat = jnp.pad(halo_flat, ((0, pad_h), (0, 0)))
            halo_out = csr_mean_aggregate(
                halo_flat.astype(jnp.float32), hf, hb
            )
            return (local_out + halo_out).astype(x_l.dtype)

        # 2. local partial first (scheduler can overlap it with the a2a);
        #    accumulate counts and sums in f32 regardless of compute dtype
        acc = jnp.float32
        is_local = e_slot < plan.block
        m_local = (e_mask & is_local).astype(acc)
        local_feats = x_l[jnp.minimum(e_slot, plan.block - 1)].astype(acc)
        tot = jax.ops.segment_sum(
            local_feats * m_local[:, None], e_src,
            num_segments=plan.block,
        )
        cnt = jax.ops.segment_sum(m_local, e_src, num_segments=plan.block)

        # 3. remote contribution from the halo
        m_rem = (e_mask & ~is_local).astype(acc)
        rem_feats = halo_flat[
            jnp.maximum(e_slot - plan.block, 0)
        ].astype(acc)
        tot = tot + jax.ops.segment_sum(
            rem_feats * m_rem[:, None], e_src, num_segments=plan.block
        )
        cnt = cnt + jax.ops.segment_sum(m_rem, e_src, num_segments=plan.block)
        return (tot / jnp.maximum(cnt, 1.0)[:, None]).astype(x_l.dtype)

    extra = tuple(csr_arrays) if csr_arrays is not None else ()
    kwargs = {}
    if csr_statics is not None:
        # pallas_call's out_shape carries no varying-mesh-axes annotation,
        # so the vma consistency check cannot see through it
        kwargs["check_vma"] = False
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis),) * (6 + len(extra)),
        out_specs=P(axis),
        **kwargs,
    )(
        x_sharded,
        plan.edge_src_local,
        plan.edge_dst_slot,
        plan.edge_mask,
        plan.send_idx,
        plan.send_mask,
        *extra,
    )


def build_node_sharded_train_step(
    mesh: Mesh,
    graph,
    metapaths,
    split,
    num_classes: int,
    cfg=None,
    seed: int = 0,
    axis: str = "nodes",
    class_weighted: bool = False,
):
    """Full MPGNN training step with NODE-SHARDED activations.

    Node features and every intermediate activation stay block-partitioned
    across ``axis``; each hop's aggregation is the halo exchange above, the
    GEMM side is annotated for GSPMD (weights replicated, activations
    sharded on rows), and the loss gathers the train rows across shards.
    This is the configuration for graphs whose [N, F]/[N, H] state exceeds
    one chip's HBM.

    The step is THE REAL MODEL, not a simplified twin: it runs
    ``models.mpgnn.mpgnn_forward`` over 'halo' hop ops — multi-metapath
    conv stacks with the concat head (model.py:179-228), basis/block weight
    decompositions via cfg.num_bases/num_blocks, epoch-invariant first-hop
    caching (the hop-0 aggregation of the constant features is computed ONCE
    here and enters every step as an argument), cfg.compute_dtype,
    cfg.dropout with the rbg/threefry key choice, and the same (optionally
    class-weighted) NLL as ``train_mpgnn``. The halo plan arrays enter the
    jitted step as ARGUMENTS (via split_hop_ops/retag_hop_ops, like
    train_mpgnn) — embedding hundreds of MB of plan tables as closure
    constants bloats the serialized HLO. For whole training runs prefer
    ``train_mpgnn(backend='halo', mesh=...)``, which wraps the identical
    program in the epoch ``lax.scan``.

    ``metapaths`` may be one metapath (flat ints) or a list of metapaths.
    Returns (step_fn, params, opt_state, x_sharded); the ``x`` passed to
    ``step_fn`` must be the returned ``x_sharded`` (the cached hop-0
    aggregation was computed from it)."""
    import optax
    from jax.sharding import NamedSharding

    from mpgnn_tpu.config import MPGNNConfig
    from mpgnn_tpu.models.mpgnn import (
        init_mpgnn,
        mpgnn_forward,
        precompute_first_hop,
    )
    from mpgnn_tpu.train.loops import (
        build_hop_arrays,
        make_optimizer,
        retag_hop_ops,
        split_hop_ops,
    )

    cfg = cfg or MPGNNConfig()
    if metapaths and not hasattr(metapaths[0], "__len__"):
        metapaths = [list(metapaths)]
    metapaths = [list(mp) for mp in metapaths]
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    hop_ops = build_hop_arrays(
        graph, metapaths, backend="halo", mesh=mesh, mesh_axis=axis,
        halo_exchange=cfg.halo_exchange, halo_local=cfg.halo_local,
    )
    hop_kinds, hop_data = split_hop_ops(hop_ops)
    hop_data = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, row), hop_data
    )
    x_sharded = shard_graph_features(np.asarray(graph.x), mesh, axis)
    train_idx = jax.device_put(jnp.asarray(split.train_idx), repl)
    train_y = jax.device_put(jnp.asarray(split.train_y), repl)
    compute_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )

    if class_weighted:
        counts = np.bincount(np.asarray(split.train_y), minlength=num_classes)
        cw = jnp.asarray(
            len(split.train_y) / (num_classes * np.maximum(counts, 1)),
            dtype=jnp.float32,
        )
    else:
        cw = jnp.ones((num_classes,), jnp.float32)
    cw = jax.device_put(cw, repl)

    params = init_mpgnn(
        jax.random.PRNGKey(seed), graph.feat_dim, cfg.hidden_dim,
        num_classes, metapaths,
        num_bases=cfg.num_bases, num_blocks=cfg.num_blocks,
    )
    params = jax.device_put(params, repl)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    def loss_fn(p, x, ops, first_aggs, rng):
        logp = mpgnn_forward(
            p, x, ops,
            dropout_rate=cfg.dropout, dropout_rng=rng, train=True,
            compute_dtype=compute_dtype, first_hop_agg=first_aggs,
        )[train_idx]                                 # cross-shard gather
        per = -jnp.take_along_axis(logp, train_y[:, None], axis=1)[:, 0]
        w = cw[train_y]
        return jnp.sum(per * w) / jnp.sum(w)

    @jax.jit
    def _step(p, opt_st, x, rng, hd, first_aggs):
        ops = retag_hop_ops(hop_kinds, hd)
        loss, g = jax.value_and_grad(loss_fn)(p, x, ops, first_aggs, rng)
        upd, opt_st = tx.update(g, opt_st, p)
        return optax.apply_updates(p, upd), opt_st, loss

    # hop-0 aggregates the CONSTANT input features — compute it once, not
    # per step (train_mpgnn computes it once outside the epoch scan)
    @jax.jit
    def _first(x, hd):
        return precompute_first_hop(
            x, retag_hop_ops(hop_kinds, hd), compute_dtype
        )

    first_aggs = _first(x_sharded, hop_data)

    def step_fn(p, opt_st, x, rng):
        return _step(p, opt_st, x, rng, hop_data, first_aggs)

    return step_fn, params, opt_state, x_sharded
