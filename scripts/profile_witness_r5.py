"""Dissect the device witness program (round-5: 0.60 s of the flagship
prove): time the set-scatter, twin nodes, multiplicity counting and final
column gathers separately on the device, with the real flagship shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp


def get1(arr):
    return np.asarray(jax.device_get(arr.reshape(-1)[:1]))


def bench(name, j, *args, reps=3):
    o = j(*args)
    leaves = jax.tree_util.tree_leaves(o)
    get1(leaves[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = j(*args)
        leaves = jax.tree_util.tree_leaves(o)
        get1(leaves[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"{name:<44s} {(times[len(times)//2]-BASE)*1e3:9.2f} ms",
          flush=True)


def main():
    global BASE
    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.cs import places
    from boojum_tpu.prover.device_witness import DeviceWitnessProgram

    data = bytes(np.random.default_rng(42).integers(0, 256, 8192,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    print(f"synthesis {time.time()-t0:.1f}s", flush=True)
    n = cs.domain_size if hasattr(cs, "domain_size") else 1 << 16
    prog = DeviceWitnessProgram(cs, 1 << 16)

    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        get1(x0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    BASE = ts[len(ts) // 2]
    print(f"baseline get: {BASE*1e3:.2f} ms", flush=True)

    # stats
    set_idx_host = np.asarray(jax.device_get(
        prog._aux[0]))  # set_scatter_aux == 0 by construction
    V = int(set_idx_host.max()) + 1 if set_idx_host.size else 1
    print(f"set elems: {set_idx_host.size}, V≈{V}", flush=True)
    contig = np.array_equal(
        set_idx_host, np.arange(set_idx_host[0],
                                set_idx_host[0] + set_idx_host.size))
    sorted_frac = float(np.mean(np.diff(set_idx_host.astype(np.int64)) == 1))
    print(f"set idx fully contig: {contig}; frac consecutive: "
          f"{sorted_frac:.3f}", flush=True)

    # full program
    t0 = time.perf_counter()
    out = prog()
    get1(out.lo)
    print(f"full witness program (incl. upload): "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    bench("full witness program (warm)",
          lambda: prog(), reps=3)

    vals = prog._set_values
    a8 = vals[prog._idx8].astype(np.uint8)
    a32 = vals[prog._idx32].astype(np.uint32)
    v64 = vals[prog._idx64]
    lo64 = (v64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi64 = (v64 >> np.uint64(32)).astype(np.uint32)
    aux = prog._aux
    Vv = V

    # piece 1: set scatter only
    n8, n32 = prog._idx8.shape[0], prog._idx32.shape[0]
    inv_perm = prog._set_inv_perm

    def set_only(a8, a32, lo64, hi64):
        set_lo = jnp.concatenate([a8.astype(jnp.uint32), a32,
                                  lo64])[jnp.asarray(inv_perm)]
        vlo = jnp.zeros((Vv,), jnp.uint32)
        return vlo.at[aux[0]].set(set_lo)

    bench("set scatter (lo only)", jax.jit(set_only),
          jnp.asarray(a8), jnp.asarray(a32), jnp.asarray(lo64),
          jnp.asarray(hi64))

    # piece 2: final column gathers
    ci, pi, kc = None, None, 0
    # reconstruct a column gather like the program's (copy cols)
    cpd = cs.copy_permutation_data
    idx = places.index_of(cpd[:, :1 << 16]).astype(np.int64)
    idx = np.minimum(idx, Vv - 1).astype(np.int32)
    ph = (cpd[:, :1 << 16] & np.uint64(places.PLACEHOLDER_BIT)) != 0
    idx_d = jnp.asarray(idx)
    ph_d = jnp.asarray(ph)
    vlo_d = jnp.zeros((Vv,), jnp.uint32)

    def col_gather(vlo):
        return jnp.where(ph_d, jnp.uint32(0), vlo[idx_d])

    print(f"copy col gather shape: {idx.shape}", flush=True)
    bench("column gather (copy cols, lo)", jax.jit(col_gather), vlo_d)

    # piece 3: multiplicity counting
    groups = list(cs.lookup_multiplicity_groups())
    print(f"mult groups: {len(groups)}; sizes: "
          f"{[places.index_of(k).size for _, k in groups][:6]}...", flush=True)

    def mult_only(vlo):
        mults = [jnp.zeros((m.shape[0],), jnp.uint32)
                 for m in cs.lookup_multiplicities]
        for tbl_idx, key_places in groups:
            key_idx = places.index_of(key_places)
            keys = vlo[jnp.asarray(key_idx.reshape(-1))].reshape(
                key_idx.shape)
            s = prog._table_shifts[tbl_idx]
            packed = keys[0]
            for i in range(1, key_idx.shape[0]):
                packed = (packed << jnp.uint32(s)) | keys[i]
            tbl = cs.lookup_tables[tbl_idx]
            keys_t = [tbl.content[:, i].astype(np.uint64)
                      for i in range(tbl.num_keys)]
            pk = keys_t[0]
            for k2 in keys_t[1:]:
                pk = (pk << np.uint64(s)) | k2
            order = np.asarray(tbl._sort_order, np.int32)
            srt = jnp.asarray(pk.astype(np.uint32)[order])
            pos = jnp.searchsorted(srt, packed)
            rows = jnp.asarray(order)[pos]
            mults[tbl_idx] = mults[tbl_idx].at[rows].add(1)
        return tuple(mults)

    bench("multiplicity counting", jax.jit(mult_only), vlo_d)

    # gather strategy variants for the final column gathers
    vhi_d = jnp.ones((Vv,), jnp.uint32)

    def g_two(vlo, vhi):
        return vlo[idx_d], vhi[idx_d]

    bench("col gather: two separate", jax.jit(g_two), vlo_d, vhi_d)

    def g_stacked(vlo, vhi):
        vboth = jnp.stack([vlo, vhi])  # (2, V)
        out = jnp.take(vboth, idx_d.reshape(-1), axis=1)
        return out.reshape(2, *idx_d.shape)

    bench("col gather: stacked axis-1 take", jax.jit(g_stacked), vlo_d, vhi_d)

    def g_sorted(vlo, vhi):
        flat = idx_d.reshape(-1)
        order = jnp.argsort(flat)
        srt = flat[order]
        glo = vlo[srt]
        ghi = vhi[srt]
        inv = jnp.argsort(order)
        return glo[inv].reshape(idx_d.shape), ghi[inv].reshape(idx_d.shape)

    bench("col gather: sort+gather+unsort", jax.jit(g_sorted), vlo_d, vhi_d)

    # multiplicity via equality-reduce instead of scatter-add (per table)
    def mult_eqreduce(vlo):
        outs = []
        for tbl_idx, key_places in groups[:4]:
            key_idx = places.index_of(key_places)
            keys = vlo[jnp.asarray(key_idx.reshape(-1))].reshape(
                key_idx.shape)
            s = prog._table_shifts[tbl_idx]
            packed = keys[0]
            for i in range(1, key_idx.shape[0]):
                packed = (packed << jnp.uint32(s)) | keys[i]
            tbl = cs.lookup_tables[tbl_idx]
            keys_t = [tbl.content[:, i].astype(np.uint64)
                      for i in range(tbl.num_keys)]
            pk = keys_t[0]
            for k2 in keys_t[1:]:
                pk = (pk << np.uint64(s)) | k2
            tb = jnp.asarray(pk.astype(np.uint32))
            # (n_keys, T) equality reduce in T-blocks of 512
            T = tb.shape[0]
            cnts = []
            for st in range(0, T, 512):
                blk = tb[st:st + 512]
                eq = (packed[:, None] == blk[None, :]).astype(jnp.uint32)
                cnts.append(eq.sum(axis=0))
            outs.append(jnp.concatenate(cnts))
        return tuple(outs)

    bench("multiplicity eq-reduce (first 4 groups)",
          jax.jit(mult_eqreduce), vlo_d)


if __name__ == "__main__":
    main()
