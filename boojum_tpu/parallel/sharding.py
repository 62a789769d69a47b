"""Multi-chip sharding: column-sharded LDE + row-sharded Merkle commit.

The reference has NO distributed backend (rayon shared memory only, SURVEY
§2.4); this is the new capability the TPU build adds (SURVEY §7 step 9):

- trace columns are sharded across the mesh axis — NTT/LDE is embarrassingly
  parallel per column (each device transforms its column subset locally);
- Merkle leaf hashing needs whole rows, so an `all_to_all` collective
  transposes from column-sharded to row-sharded layout over ICI;
- each device hashes the leaves of its row shard; the sub-tree caps are
  `all_gather`-ed and the top of the tree is completed on every device
  (replicated, tiny);
- grand-product / lookup-sum style reductions use `psum` over the axis.

Everything is expressed with `shard_map` over a 1-D `jax.sharding.Mesh`, so
the same code runs on a virtual CPU mesh (tests), a single real chip, or a
pod slice.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..field import goldilocks as gl
from ..field.goldilocks import GL
from ..hash import sponge
from ..hash.poseidon2 import _permutation_stacked
from ..ntt import ntt

AXIS = "shard"


def make_mesh(n_devices: int = None) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (AXIS,))


def _local_lde(cols: GL, log_n: int, lde_factor: int) -> GL:
    """(n, k_local) monomials -> (lde*n, k_local) flat bitreversed evals."""
    out = ntt.lde_from_monomials(cols, log_n, lde_factor)
    l, n, k = out.shape
    return out.reshape(l * n, k)


def _leaf_hash_rows_traced(rows: GL) -> GL:
    """Trace-safe leaf hashing (no fixed-batch driver): direct stacked sponge."""
    k, = rows.lo.shape[1:]
    m = rows.lo.shape[0]
    state = gl.zeros((12, m))
    full, rem = divmod(k, 8)
    pos = 0
    cols = GL(rows.lo.T, rows.hi.T)
    st_lo, st_hi = state.lo, state.hi

    def absorb(st_lo, st_hi, start, count):
        st_lo = st_lo.at[:count].set(cols.lo[start:start + count])
        st_hi = st_hi.at[:count].set(cols.hi[start:start + count])
        if count < 8:
            st_lo = st_lo.at[count:8].set(0)
            st_hi = st_hi.at[count:8].set(0)
        out = _permutation_stacked(GL(st_lo, st_hi))
        return out.lo, out.hi

    for _ in range(full):
        st_lo, st_hi = absorb(st_lo, st_hi, pos, 8)
        pos += 8
    if rem:
        st_lo, st_hi = absorb(st_lo, st_hi, pos, rem)
    return GL(st_lo[:4].T, st_hi[:4].T)  # (m, 4)


def distributed_commit_step(mesh: Mesh, log_n: int, lde_factor: int,
                            cap_size: int):
    """Build the jitted sharded commit step: monomial columns (n, k) sharded
    over k -> (leaf hashes row-sharded, replicated cap)."""

    n_shards = mesh.devices.size

    def step(cols_lo, cols_hi):
        def inner(lo, hi):
            # 1. local LDE of this device's columns
            flat = _local_lde(GL(lo, hi), log_n, lde_factor)  # (L*n, k_local)
            # 2. collective transpose: split rows into n_shards blocks,
            #    exchange so each device gets all columns of its row block
            m = flat.lo.shape[0]
            block = m // n_shards
            lo_b = flat.lo.reshape(n_shards, block, -1)
            hi_b = flat.hi.reshape(n_shards, block, -1)
            # split axis 0 across devices; received pieces land on a new
            # source-device axis at position 1:
            # (n_shards, block, k_local) -> (block, n_shards, k_local)
            lo_t = jax.lax.all_to_all(lo_b, AXIS, 0, 1, tiled=False)
            hi_t = jax.lax.all_to_all(hi_b, AXIS, 0, 1, tiled=False)
            # -> (block, k) rows carrying all columns in original order
            lo_rows = lo_t.reshape(block, -1)
            hi_rows = hi_t.reshape(block, -1)
            # 3. local leaf hashing of the row block
            leaves = _leaf_hash_rows_traced(GL(lo_rows, hi_rows))  # (block, 4)
            # 4. local sub-tree down to one node per device
            cur = GL(leaves.lo.T, leaves.hi.T)  # (4, block)
            while cur.lo.shape[1] > 1:
                left = cur[:, 0::2]
                right = cur[:, 1::2]
                st = gl.zeros((12, left.lo.shape[1]))
                st_lo = st.lo.at[:4].set(left.lo).at[4:8].set(right.lo)
                st_hi = st.hi.at[:4].set(left.hi).at[4:8].set(right.hi)
                out = _permutation_stacked(GL(st_lo, st_hi))
                cur = GL(out.lo[:4], out.hi[:4])
            # 5. gather the per-device roots (the cap ring) over ICI
            cap_lo = jax.lax.all_gather(cur.lo[:, 0], AXIS, axis=1)  # (4, S)
            cap_hi = jax.lax.all_gather(cur.hi[:, 0], AXIS, axis=1)
            return leaves.lo, leaves.hi, cap_lo, cap_hi

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(None, AXIS), P(None, AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(), P()),
            check_vma=False,
        )(cols_lo, cols_hi)

    return jax.jit(step)


def distributed_sum_reduce(mesh: Mesh):
    """Cross-device modular reduction of per-device partial sums (the
    pattern lookup-denominator and grand-product accumulations ride on).

    Modular add does not commute with jax.lax.psum's wraparound u32 adds, so
    the reduction all_gathers the S per-device partials and folds them with
    the carry-correct field add. The gathered fold is O(S) replicated work on
    every device — fine for the partial-sum scalars this is used on (bytes,
    not polynomials); the O(n) data never crosses devices."""

    def step(x_lo, x_hi):
        def inner(lo, hi):
            # local modular sum then cross-device: add in u64 then reduce
            local = GL(lo, hi)
            acc = local[0]
            for i in range(1, lo.shape[0]):
                acc = gl.add(acc, local[i])
            # psum over the ring: emulate modular psum by gathering
            all_lo = jax.lax.all_gather(acc.lo, AXIS)
            all_hi = jax.lax.all_gather(acc.hi, AXIS)
            total = GL(all_lo[0], all_hi[0])
            for i in range(1, all_lo.shape[0]):
                total = gl.add(total, GL(all_lo[i], all_hi[i]))
            return total.lo, total.hi

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )(x_lo, x_hi)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Distributed four-step NTT: one poly too large for a single chip's HBM is
# row-sharded over the mesh; two all_to_all transposes bracket purely local
# NTT passes (the classic distributed FFT schedule mapped onto ICI).
#
# With n = n1·n2, j = j1·n2 + j2, k = k1 + n1·k2 (see pallas_ntt.ntt_fourstep
# for the single-chip derivation):
#   device d starts with the j1-block  [d·n1/S, (d+1)·n1/S)  (natural rows),
#   transpose 1  -> all j1 for the j2-block of d,
#   local NTT_{n1} over j1  (bitreversed p1 rows),
#   · cross twiddle w[p1, j2]  (passed pre-sharded over j2),
#   transpose 2  -> all j2 for the p1-block of d,
#   local NTT_{n2} over j2  (bitreversed p2),
#   flatten (p1_local, p2): device d ends holding the contiguous block
#   [d·n/S, (d+1)·n/S) of the FULL bitreversed output.
# ---------------------------------------------------------------------------


def _fourstep_split(log_n: int, n_shards: int):
    log_s = int(n_shards).bit_length() - 1
    assert 1 << log_s == n_shards
    log_n1 = max((log_n + 1) // 2, log_s)
    log_n2 = log_n - log_n1
    assert log_n2 >= log_s, "need n2 >= n_shards for the j2 transpose"
    return log_n1, log_n2


def fourstep_cross_twiddles(log_n: int, n_shards: int):
    """Host (n1, n2) cross-twiddle table w[p1, j2] = ω^{bitrev(p1)·j2},
    as (lo, hi) u32 arrays, to be fed sharded over axis 1 (j2)."""
    from ..ntt.pallas_ntt import _fourstep_twiddles_host
    log_n1, log_n2 = _fourstep_split(log_n, n_shards)
    return _fourstep_twiddles_host(log_n1, log_n2)


def coset_power_factors(log_n: int, n_shards: int, coset: int):
    """coset^{j} factored as pj1[j1]·pj2[j2] (j = j1·n2 + j2): host u32-limb
    pairs (pj1_lo, pj1_hi, pj2_lo, pj2_hi). Feed pj1 sharded over the axis."""
    from ..utils import npgl
    log_n1, log_n2 = _fourstep_split(log_n, n_shards)
    pj2 = npgl.powers(coset, 1 << log_n2)
    c_n2 = int(pow(coset, 1 << log_n2, npgl.ORDER))
    pj1 = npgl.powers(c_n2, 1 << log_n1)

    def limbs(a):
        import numpy as np
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))

    return limbs(pj1) + limbs(pj2)


def distributed_ntt(mesh: Mesh, log_n: int, batch: int):
    """Jitted sharded forward NTT of one (n, B) column batch, natural
    row-sharded input -> bitreversed row-sharded output.

    Optionally scales the input by a factored coset power column
    (pj1 sharded, pj2 replicated) so the same step does coset evals/LDE
    legs. Pass all-ones arrays for a plain NTT.
    """
    n_shards = mesh.devices.size
    log_n1, log_n2 = _fourstep_split(log_n, n_shards)
    n1, n2 = 1 << log_n1, 1 << log_n2
    n1_loc, n2_loc = n1 // n_shards, n2 // n_shards
    tw_lo, tw_hi = fourstep_cross_twiddles(log_n, n_shards)

    def step(x_lo, x_hi, pj1_lo, pj1_hi, pj2_lo, pj2_hi):
        def inner(lo, hi, p1l, p1h, p2l, p2h, twl, twh):
            b = lo.shape[1]
            # coset scaling: coset^{j1·n2+j2} = pj1[j1]·pj2[j2]; built as a
            # 2-D outer product and applied 2-D lane-major — elementwise math
            # on (r, c, b) views with b < 128 trailing is the TPU layout
            # cliff (~100x off roofline, round-5 profile)
            scale = gl.mul(GL(p1l[:, None], p1h[:, None]),
                           GL(p2l[None, :], p2h[None, :]))  # (n1_loc, n2)
            x = GL(lo.reshape(n1_loc, n2 * b), hi.reshape(n1_loc, n2 * b))
            x = gl.mul(x, GL(ntt._rep_lanes(scale.lo, b),
                             ntt._rep_lanes(scale.hi, b)))
            # transpose 1: (n1_loc, S, n2_loc, b) -> (S, n1_loc, n2_loc, b)
            xl = x.lo.reshape(n1_loc, n_shards, n2_loc, b)
            xh = x.hi.reshape(n1_loc, n_shards, n2_loc, b)
            xl = jax.lax.all_to_all(xl, AXIS, 1, 0, tiled=False)
            xh = jax.lax.all_to_all(xh, AXIS, 1, 0, tiled=False)
            a = GL(xl.reshape(n1, n2_loc * b), xh.reshape(n1, n2_loc * b))
            # local pass 1: NTT_{n1} over j1 -> bitreversed p1 rows
            a = ntt.ntt_cols(a, ntt.get_plan(log_n1))
            # cross twiddles, j2-sharded slice handed in via in_specs (2-D)
            a = gl.mul(a, GL(ntt._rep_lanes(twl, b), ntt._rep_lanes(twh, b)))
            # transpose 2: (S, n1_loc, n2_loc, b) -> (n1_loc, S, n2_loc, b)
            al = a.lo.reshape(n_shards, n1_loc, n2_loc, b)
            ah = a.hi.reshape(n_shards, n1_loc, n2_loc, b)
            al = jax.lax.all_to_all(al, AXIS, 0, 1, tiled=False)
            ah = jax.lax.all_to_all(ah, AXIS, 0, 1, tiled=False)
            al = al.reshape(n1_loc, n2, b)
            ah = ah.reshape(n1_loc, n2, b)
            # local pass 2: NTT_{n2} over j2 for every local p1 row
            bt = GL(jnp.swapaxes(al, 0, 1).reshape(n2, n1_loc * b),
                    jnp.swapaxes(ah, 0, 1).reshape(n2, n1_loc * b))
            bt = ntt.ntt_cols(bt, ntt.get_plan(log_n2))
            bl = jnp.swapaxes(bt.lo.reshape(n2, n1_loc, b), 0, 1)
            bh = jnp.swapaxes(bt.hi.reshape(n2, n1_loc, b), 0, 1)
            return bl.reshape(n1_loc * n2, b), bh.reshape(n1_loc * n2, b)

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(),
                      P(None, AXIS), P(None, AXIS)),
            out_specs=(P(AXIS), P(AXIS)),
            check_vma=False,
        )(x_lo, x_hi, pj1_lo, pj1_hi, pj2_lo, pj2_hi,
          jnp.asarray(tw_lo), jnp.asarray(tw_hi))

    return jax.jit(step)


def distributed_grand_product(mesh: Mesh, n: int):
    """Jitted sharded exclusive grand product over GoldilocksExt2 ratios
    (the copy-permutation z-poly recurrence, BASELINE configs[4]): each
    device scans its row shard locally, the per-shard totals cross the ICI
    once (`all_gather`), and every device folds in the exclusive prefix of
    the totals before it. One collective, local everything else."""
    from ..field import extension as ext2d
    from ..field.extension import GL2
    from ..prover.device import grand_product_exclusive

    n_shards = mesh.devices.size
    assert n % n_shards == 0

    def step(c0l, c0h, c1l, c1h):
        def inner(c0l, c0h, c1l, c1h):
            ratios = GL2(GL(c0l, c0h), GL(c1l, c1h))
            local_excl = grand_product_exclusive(ratios)
            last = GL2(GL(local_excl.c0.lo[-1], local_excl.c0.hi[-1]),
                       GL(local_excl.c1.lo[-1], local_excl.c1.hi[-1]))
            tail = GL2(GL(ratios.c0.lo[-1], ratios.c0.hi[-1]),
                       GL(ratios.c1.lo[-1], ratios.c1.hi[-1]))
            total = ext2d.mul(last, tail)  # inclusive product of this shard
            # gather all shard totals, fold exclusive prefix of earlier shards
            t0l = jax.lax.all_gather(total.c0.lo, AXIS)
            t0h = jax.lax.all_gather(total.c0.hi, AXIS)
            t1l = jax.lax.all_gather(total.c1.lo, AXIS)
            t1h = jax.lax.all_gather(total.c1.hi, AXIS)
            me = jax.lax.axis_index(AXIS)
            offset = ext2d.ones(())
            for d in range(n_shards):
                cand = GL2(GL(t0l[d], t0h[d]), GL(t1l[d], t1h[d]))
                use = d < me
                mult = GL2(
                    GL(jnp.where(use, cand.c0.lo, jnp.uint32(1)),
                       jnp.where(use, cand.c0.hi, jnp.uint32(0))),
                    GL(jnp.where(use, cand.c1.lo, jnp.uint32(0)),
                       jnp.where(use, cand.c1.hi, jnp.uint32(0))))
                offset = ext2d.mul(offset, mult)
            out = ext2d.mul(local_excl, GL2(
                GL(jnp.broadcast_to(offset.c0.lo, local_excl.c0.lo.shape),
                   jnp.broadcast_to(offset.c0.hi, local_excl.c0.hi.shape)),
                GL(jnp.broadcast_to(offset.c1.lo, local_excl.c1.lo.shape),
                   jnp.broadcast_to(offset.c1.hi, local_excl.c1.hi.shape))))
            return out.c0.lo, out.c0.hi, out.c1.lo, out.c1.hi

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        )(c0l, c0h, c1l, c1h)

    return jax.jit(step)


def distributed_intt(mesh: Mesh, log_n: int, batch: int):
    """Jitted sharded inverse NTT: bitreversed row-sharded evals (n, B) ->
    natural row-sharded coefficients. Mirrors distributed_ntt in reverse
    (ntt.intt_fourstep_cols composition): local iNTT_{n2} over p2, divide the
    cross twiddles, all_to_all to collect full p1 columns, local iNTT_{n1},
    all_to_all back to natural contiguous j-blocks.

    Optionally un-scales a coset afterwards via the factored power columns
    (pass all-ones for the plain domain)."""
    from ..utils import npgl

    n_shards = mesh.devices.size
    log_n1, log_n2 = _fourstep_split(log_n, n_shards)
    n1, n2 = 1 << log_n1, 1 << log_n2
    n1_loc, n2_loc = n1 // n_shards, n2 // n_shards
    tw_lo, tw_hi = fourstep_cross_twiddles(log_n, n_shards)
    tw = tw_lo.astype(np.uint64) | (tw_hi.astype(np.uint64) << np.uint64(32))
    tw_inv = npgl.batch_inv(tw.reshape(-1)).reshape(n1, n2)
    twi_lo = (tw_inv & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    twi_hi = (tw_inv >> np.uint64(32)).astype(np.uint32)

    def step(y_lo, y_hi, pj1_lo, pj1_hi, pj2_lo, pj2_hi):
        def inner(lo, hi, p1l, p1h, p2l, p2h, twl, twh):
            b = lo.shape[1]
            # rows: contiguous p1-block of the (p1, p2) flatten
            y = GL(lo.reshape(n1_loc, n2, b), hi.reshape(n1_loc, n2, b))
            # local pass 1: iNTT_{n2} over p2 for every local p1 row
            yt = GL(jnp.swapaxes(y.lo, 0, 1).reshape(n2, n1_loc * b),
                    jnp.swapaxes(y.hi, 0, 1).reshape(n2, n1_loc * b))
            yt = ntt.intt_cols(yt, ntt.get_plan(log_n2))
            s1 = GL(jnp.swapaxes(yt.lo.reshape(n2, n1_loc, b), 0, 1)
                    .reshape(n1_loc, n2 * b),
                    jnp.swapaxes(yt.hi.reshape(n2, n1_loc, b), 0, 1)
                    .reshape(n1_loc, n2 * b))
            # divide cross twiddles (p1-sharded slice via in_specs) — 2-D
            # lane-major (3-D elementwise is the TPU layout cliff)
            s1 = gl.mul(s1, GL(ntt._rep_lanes(twl, b),
                               ntt._rep_lanes(twh, b)))
            # transpose: collect ALL p1 for this device's j2 block
            sl = s1.lo.reshape(n1_loc, n_shards, n2_loc, b)
            sh = s1.hi.reshape(n1_loc, n_shards, n2_loc, b)
            sl = jax.lax.all_to_all(sl, AXIS, 1, 0, tiled=False)
            sh = jax.lax.all_to_all(sh, AXIS, 1, 0, tiled=False)
            a = GL(sl.reshape(n1, n2_loc * b), sh.reshape(n1, n2_loc * b))
            # local pass 2: iNTT_{n1} over p1 -> natural j1
            a = ntt.intt_cols(a, ntt.get_plan(log_n1))
            a = a.reshape(n1, n2_loc, b)
            # transpose back: natural contiguous j1-blocks per device
            al = a.lo.reshape(n_shards, n1_loc, n2_loc, b)
            ah = a.hi.reshape(n_shards, n1_loc, n2_loc, b)
            al = jax.lax.all_to_all(al, AXIS, 0, 1, tiled=False)
            ah = jax.lax.all_to_all(ah, AXIS, 0, 1, tiled=False)
            # (n1_loc, S, n2_loc, b) -> (n1_loc, n2*b), 2-D lane-major
            x = GL(al.reshape(n1_loc, n2 * b), ah.reshape(n1_loc, n2 * b))
            # coset un-scale: x_j /= coset^{j} = pj1[j1]·pj2[j2] (inverted
            # factors passed in) — 2-D outer product, lane-repeated
            scale = gl.mul(GL(p1l[:, None], p1h[:, None]),
                           GL(p2l[None, :], p2h[None, :]))  # (n1_loc, n2)
            x = gl.mul(x, GL(ntt._rep_lanes(scale.lo, b),
                             ntt._rep_lanes(scale.hi, b)))
            return x.lo.reshape(n1_loc * n2, b), x.hi.reshape(n1_loc * n2, b)

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(),
                      P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS)),
            check_vma=False,
        )(y_lo, y_hi, pj1_lo, pj1_hi, pj2_lo, pj2_hi,
          jnp.asarray(twi_lo), jnp.asarray(twi_hi))

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Sharded Merkle tree: leaf hashing + sub-cap layers local per shard, top
# layers replicated. Returns every layer so query paths work as on a single
# device (DeviceTree interface).
# ---------------------------------------------------------------------------


def sharded_tree_layers(mesh: Mesh, m: int, k_padded: int, cap_size: int):
    """Jitted builder: leaf columns (k, m) row(m)-sharded -> list of tree
    layers [(4, m), (4, m/2), ..., (4, cap_size)]; layers of width > S
    stay sharded over the mesh axis, smaller ones are replicated."""
    from ..prover.device_merkle import (_leaf_hashes_traced,
                                        _node_layer_traced)

    n_shards = mesh.devices.size
    m_loc = m // n_shards
    assert m_loc * n_shards == m and m_loc >= 1
    local_stop = max(1, cap_size // n_shards)  # cap nodes per shard (>= 1)
    num_sharded_levels = 1 + (m_loc // local_stop).bit_length() - 1

    def step(cols_lo, cols_hi):
        def inner(lo, hi):
            leaves = _leaf_hashes_traced(GL(lo, hi))  # (4, m_loc)
            outs = [leaves.lo, leaves.hi]
            cur = leaves
            while cur.lo.shape[1] > local_stop:
                cur = _node_layer_traced(cur)
                outs.extend((cur.lo, cur.hi))
            if cap_size < n_shards:
                # per-shard root ring -> replicated top layers
                top_lo = jax.lax.all_gather(cur.lo[:, 0], AXIS, axis=1)
                top_hi = jax.lax.all_gather(cur.hi[:, 0], AXIS, axis=1)
                cur = GL(top_lo, top_hi)  # (4, S)
                while cur.lo.shape[1] > cap_size:
                    cur = _node_layer_traced(cur)
                    outs.extend((cur.lo, cur.hi))
            return tuple(outs)

        num_rep_levels = max((n_shards.bit_length() - 1)
                             - (cap_size.bit_length() - 1), 0)
        out_specs = tuple([P(None, AXIS)] * (2 * num_sharded_levels)
                          + [P(None, None)] * (2 * num_rep_levels))
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(None, AXIS), P(None, AXIS)),
            out_specs=out_specs,
            check_vma=False,
        )(cols_lo, cols_hi)

    return jax.jit(step)


def build_sharded_tree(mesh: Mesh, cols: GL, cap_size: int):
    """Poseidon2 Merkle-cap tree over row-sharded leaf columns (k, m);
    returns a DeviceTree whose wide layers are mesh-sharded arrays."""
    from ..prover.device_merkle import DeviceTree, _pad_cols_to_rate

    cols = _pad_cols_to_rate(cols)
    k, m = cols.shape
    outs = sharded_tree_layers(mesh, m, k, cap_size)(cols.lo, cols.hi)
    layers = [(outs[2 * i], outs[2 * i + 1]) for i in range(len(outs) // 2)]
    return DeviceTree(layers)
