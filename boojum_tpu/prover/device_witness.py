"""On-device witness materialization.

The recorded witness program (cs/resolver.py) is a short list of vectorized
nodes; when every computation node carries a ``device_twin`` (a jnp mirror of
its numpy closure) or ``device_lookup`` metadata (multiplicity counting),
the WHOLE program compiles into ONE jitted device function:

    (set_values arrays — the circuit inputs + constants, a few kB)
        -> scatter/gather over a device value buffer
        -> the witness column groups, multiplicity column and public values

Repeated proving then uploads only the inputs instead of ~30 MB of witness
columns per proof (the top remaining flagship transfer cost). This is the
device-side answer to the reference's ``take_witness_using_hints``
(src/cs/implementations/witness.rs:325): the reference copies host-resolved
values into column polys; here the resolution program itself runs on-chip.

Byte-identity: the twins compute the SAME integer values (asserted against
the host path in tests), so proofs are bit-identical.
"""

from __future__ import annotations

import numpy as np

from ..cs import places
from ..field.goldilocks import GL


def _limbs(a: np.ndarray):
    a = np.asarray(a, np.uint64)
    return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


def _table_shift(tbl):
    """Per-key bit shift for a u32 device packing of the table keys, or
    None if the keys cannot fit 32 bits. Packing with a smaller shift is
    order-isomorphic to the host's 16-bit-shift u64 packing (lexicographic
    either way), so the host's sort order carries over (asserted at build)."""
    tbl._ensure_index()
    keys = [tbl.content[:, i] for i in range(tbl.num_keys)]
    s = max(max(int(k.max(initial=0)).bit_length(), 1) for k in keys)
    if tbl.num_keys * s > 32:
        return None
    return s


class DeviceWitnessProgram:
    """Compiled device witness materializer for one circuit."""

    def __init__(self, cs, n: int):
        self.cs = cs
        self.n = n
        self._build(cs, n)

    @staticmethod
    def supported(cs) -> bool:
        if cs.public_inputs:
            return False  # host needs public values pre-prove; keep simple
        if cs.resolver is None or not cs.resolver.record:
            return False
        for fn, ins, outs in cs.resolver.record:
            if fn is None:
                continue
            if getattr(fn, "device_twin", None) is not None:
                continue
            if getattr(fn, "device_lookup", None) is not None:
                # multiplicity counting is re-derived from the placed lookup
                # instances (lookup_multiplicity_groups), not this node
                continue
            return False
        if cs.lookup_parameters.lookup_is_allowed:
            for tbl in cs.lookup_tables:
                if _table_shift(tbl) is None:
                    return False
        return True

    def _build(self, cs, n: int):
        import jax
        import jax.numpy as jnp

        record = cs.resolver.record
        # static per-node data. ALL set_values nodes merge into ONE scatter
        # at the top: a set node never depends on anything and every place
        # resolves exactly once (resolver invariant), so hoisting preserves
        # semantics — and a real circuit has tens of thousands of tiny set
        # nodes (one per allocation batch), which as individual scatters
        # blow up the XLA program (LLVM section OOM on CPU).
        nodes = []
        set_vals, set_places = [], []
        v_max = 0
        for fn, ins, outs in record:
            out_idx = places.index_of(np.asarray(outs, np.uint64))
            if out_idx.size:
                v_max = max(v_max, int(out_idx.max()))
            if fn is None:
                set_vals.append(np.asarray(ins, np.uint64).reshape(-1))
                set_places.append(np.asarray(outs, np.uint64).reshape(-1))
            elif getattr(fn, "device_lookup", None) is None:
                in_idx = places.index_of(np.asarray(ins, np.uint64))
                if in_idx.size:
                    v_max = max(v_max, int(in_idx.max()))
                nodes.append(("twin", (fn.device_twin, in_idx,
                                       ins.shape), out_idx.reshape(-1)))
        # multiplicity counting: STATIC per-table groups of placed lookup
        # instances (mirrors recount_multiplicities, so padding lookups —
        # which never enter the record — are counted, and replay_witness
        # stays correct); the device packs keys and searchsorts the
        # device-packed sorted table
        mult_groups = []  # (tbl_idx, key_idx (num_keys, cnt))
        for tbl_idx, key_places in cs.lookup_multiplicity_groups():
            key_idx = places.index_of(key_places)
            if key_idx.size:
                v_max = max(v_max, int(key_idx.max()))
            mult_groups.append((tbl_idx, key_idx))
        #: concatenated (values, places) of every set node — the program
        #: INPUTS; replayable with fresh values via __call__(overrides=...)
        self._set_values = (np.concatenate(set_vals) if set_vals
                            else np.zeros(0, np.uint64))
        set_places_flat = (np.concatenate(set_places) if set_places
                          else np.zeros(0, np.uint64))
        self._set_pos = {int(p): i for i, p in enumerate(set_places_flat)}
        set_out_idx = places.index_of(set_places_flat)
        if set_out_idx.size:
            v_max = max(v_max, int(set_out_idx.max()))
        V = v_max + 1
        # width-classified upload: circuit inputs are mostly bytes/4-bit
        # chunks; shipping them as u8 instead of u32 limb pairs cuts the
        # per-prove input transfer ~8x (the tunnel sustains ~8-10 MB/s and
        # the flagship's set values are ~4 MB as raw limbs). Classes are
        # fixed at build from the recorded values; __call__ re-checks
        # against overrides and falls back to limb upload on violation.
        self._cls8 = self._set_values < (1 << 8)
        self._cls32 = ~self._cls8 & (self._set_values < (1 << 32))
        self._cls64 = ~(self._cls8 | self._cls32)
        self._idx8 = np.nonzero(self._cls8)[0]
        self._idx32 = np.nonzero(self._cls32)[0]
        self._idx64 = np.nonzero(self._cls64)[0]
        perm = np.concatenate([self._idx8, self._idx32, self._idx64])
        inv = np.empty(self._set_values.shape[0], np.int64)
        inv[perm] = np.arange(perm.shape[0])
        self._set_inv_perm = inv
        # lookup tables (prove-invariant device constants): device packing
        # uses the per-table shift; the host sort order carries over because
        # both packings are lexicographic in the key tuple
        tables = []
        self._table_shifts = []
        for tbl in cs.lookup_tables:
            s = _table_shift(tbl)
            self._table_shifts.append(s)
            if s is None:
                tables.append(None)
                continue
            keys = [tbl.content[:, i].astype(np.uint64)
                    for i in range(tbl.num_keys)]
            packed = keys[0]
            for k in keys[1:]:
                packed = (packed << np.uint64(s)) | k
            packed = packed.astype(np.uint32)
            order = np.asarray(tbl._sort_order, np.int32)
            srt = packed[order]
            assert np.all(srt[1:] > srt[:-1]), \
                "device table packing must preserve the host sort order"
            tables.append((srt, order, len(tbl)))

        # lookup tables small enough for the equality-reduce multiplicity
        # count (one (n_keys, block) compare per 512-row table block — a
        # dense VPU op instead of a TPU-hostile scatter-add: measured ~0 ms
        # vs 54 ms for the .at[].add path at flagship shapes, round 5)
        self._eq_reduce_max = 1 << 16

        # column gather indices + placeholder masks (static)
        def col_meta(data):
            if data is None or data.shape[0] == 0:
                return (np.zeros((0, n), np.int32), np.zeros((0, n), bool))
            d = data[:, :n]
            idx = places.index_of(d).astype(np.int64)
            ph = (d & np.uint64(places.PLACEHOLDER_BIT)) != 0
            return (np.minimum(idx, V - 1).astype(np.int32), ph)

        copy_meta = col_meta(cs.copy_permutation_data)
        wit_meta = col_meta(cs.witness_placement_data
                            if cs.witness_placement_data is not None and
                            cs.witness_placement_data.shape[0] else None)
        spec_parts = []
        if cs.specialized_copy_data is not None:
            spec_parts.append(col_meta(cs.specialized_copy_data))
        if cs.gate_spec_data is not None:
            spec_parts.append(col_meta(cs.gate_spec_data))
        mult_sizes = [m.shape[0] for m in cs.lookup_multiplicities] \
            if cs.lookup_parameters.lookup_is_allowed else []
        has_mult = cs.lookup_parameters.lookup_is_allowed

        # every large index/mask array rides as a RUNTIME argument (uploaded
        # once here): baked-in literals of this size blow XLA:CPU's JIT code
        # sections, and on TPU they would re-ship with the executable
        self._aux = []

        def aux(arr):
            self._aux.append(jax.device_put(jnp.asarray(arr)))
            return len(self._aux) - 1

        # contiguous set ranges write as ONE dynamic_update_slice instead of
        # a scatter (the resolver allocates set places in order, so this is
        # the common case — measured 2x on the scatter at flagship shapes)
        self._set_contig_start = None
        if set_out_idx.size and np.array_equal(
                set_out_idx,
                np.arange(set_out_idx[0],
                          set_out_idx[0] + set_out_idx.size)):
            self._set_contig_start = int(set_out_idx[0])
        set_scatter_aux = aux(set_out_idx)
        node_specs = []
        for kind, info, out_idx in nodes:
            twin, in_idx, ins_shape = info
            node_specs.append(("twin", (twin, aux(in_idx.reshape(-1)),
                                        ins_shape), aux(out_idx)))
        mult_specs = [(tbl_idx, aux(key_idx.reshape(-1)), key_idx.shape)
                      for (tbl_idx, key_idx) in mult_groups]
        table_aux = [(aux(t[0]), aux(t[1])) if t is not None else None
                     for t in tables]
        # raw unsorted packed tables for the eq-reduce count path
        raw_table_aux = []
        for tbl_idx, tbl in enumerate(cs.lookup_tables):
            s = self._table_shifts[tbl_idx]
            if s is None or len(tbl) > self._eq_reduce_max:
                raw_table_aux.append(None)
                continue
            keys = [tbl.content[:, i].astype(np.uint64)
                    for i in range(tbl.num_keys)]
            packed = keys[0]
            for k2 in keys[1:]:
                packed = (packed << np.uint64(s)) | k2
            raw_table_aux.append(aux(packed.astype(np.uint32)))
        col_aux = []
        for meta in [copy_meta, wit_meta] + spec_parts:
            idx, ph = meta
            col_aux.append((aux(idx), aux(ph), idx.shape[0]))

        inv_perm_aux = aux(self._set_inv_perm)
        n8, n32 = self._idx8.shape[0], self._idx32.shape[0]
        set_start = self._set_contig_start

        def prog(a8, a32, lo64, hi64, *ax):
            import jax.lax as lax
            set_lo = jnp.concatenate([a8.astype(jnp.uint32), a32,
                                      lo64])[ax[inv_perm_aux]]
            set_hi = jnp.concatenate(
                [jnp.zeros((n8 + n32,), jnp.uint32), hi64])[ax[inv_perm_aux]]
            vlo = jnp.zeros((V,), jnp.uint32)
            vhi = jnp.zeros((V,), jnp.uint32)
            if set_start is not None:
                vlo = lax.dynamic_update_slice(vlo, set_lo, (set_start,))
                vhi = lax.dynamic_update_slice(vhi, set_hi, (set_start,))
            else:
                vlo = vlo.at[ax[set_scatter_aux]].set(set_lo)
                vhi = vhi.at[ax[set_scatter_aux]].set(set_hi)
            for kind, info, oi in node_specs:
                twin, ii, ins_shape = info
                glo = vlo[ax[ii]].reshape(ins_shape)
                ghi = vhi[ax[ii]].reshape(ins_shape)
                olo, ohi = twin(glo, ghi)
                vlo = vlo.at[ax[oi]].set(olo.reshape(-1))
                vhi = vhi.at[ax[oi]].set(ohi.reshape(-1))
            mults = [jnp.zeros((sz,), jnp.uint32) for sz in mult_sizes]
            for tbl_idx, ki, key_shape in mult_specs:
                keys = vlo[ax[ki]].reshape(key_shape)
                s = self._table_shifts[tbl_idx]
                packed = keys[0]
                for i in range(1, key_shape[0]):
                    packed = (packed << jnp.uint32(s)) | keys[i]
                if raw_table_aux[tbl_idx] is not None:
                    # equality-reduce count in 512-row table blocks — dense
                    # VPU compare instead of a TPU-hostile scatter-add
                    tb = ax[raw_table_aux[tbl_idx]]
                    T = tb.shape[0]
                    cnts = []
                    for st_ in range(0, T, 512):
                        blk = tb[st_:st_ + 512]
                        eq = (packed[:, None] == blk[None, :])
                        cnts.append(eq.astype(jnp.uint32).sum(axis=0))
                    mults[tbl_idx] = mults[tbl_idx] + jnp.concatenate(cnts)
                else:
                    ski, ori = table_aux[tbl_idx]
                    pos = jnp.searchsorted(ax[ski], packed)
                    rows = ax[ori][pos]
                    mults[tbl_idx] = mults[tbl_idx].at[rows].add(1)

            # assemble the witness-oracle Lagrange matrix (n, K) in the
            # prover's leaf order: copy cols, specialized cols, witness
            # cols, multiplicity column (prover.materialize_witness_columns
            # + the np.concatenate in DeviceProver.prove). Both limb planes
            # ride ONE stacked axis-1 take per group: two separate 1-D
            # gathers measured 8x slower at flagship shapes (round 5).
            vboth = jnp.stack([vlo, vhi])  # (2, V)
            groups_lo, groups_hi = [], []
            order = [0] + list(range(2, 2 + len(spec_parts))) + [1]
            for gi in order:
                ci, pi, k_cols = col_aux[gi]
                if k_cols == 0:
                    continue
                g = jnp.take(vboth, ax[ci].reshape(-1), axis=1).reshape(
                    2, k_cols, n)
                groups_lo.append(jnp.where(ax[pi], jnp.uint32(0), g[0]))
                groups_hi.append(jnp.where(ax[pi], jnp.uint32(0), g[1]))
            if has_mult:
                pad = n - sum(mult_sizes)
                mult_col = jnp.concatenate(
                    mults + [jnp.zeros((pad,), jnp.uint32)])
                groups_lo.append(mult_col[None, :])
                groups_hi.append(jnp.zeros((1, n), jnp.uint32))
            lag_lo = jnp.concatenate(groups_lo, axis=0).T
            lag_hi = jnp.concatenate(groups_hi, axis=0).T
            return lag_lo, lag_hi

        self._prog = jax.jit(prog)

    def __call__(self, overrides: dict = None) -> GL:
        """Run the device program -> the witness oracle's Lagrange matrix
        GL (n, K) — columns in leaf order (vars, wits, multiplicity).

        ``overrides`` maps input PLACES to new values (the replay_witness
        contract, cs/resolver.py): only the few-kB input arrays change;
        everything else recomputes on device."""
        vals = self._set_values
        if overrides:
            vals = vals.copy()
            for p, v in overrides.items():
                pos = self._set_pos.get(int(p))
                if pos is not None:
                    vals[pos] = v
            # overrides must respect the build-time width classes (circuit
            # inputs keep their value range across replays by construction)
            assert (vals[self._idx8] < (1 << 8)).all() and \
                (vals[self._idx32] < (1 << 32)).all(), \
                "override value exceeds its recorded width class"
        a8 = vals[self._idx8].astype(np.uint8)
        a32 = vals[self._idx32].astype(np.uint32)
        v64 = vals[self._idx64]
        lo64, hi64 = _limbs(v64)
        lag_lo, lag_hi = self._prog(a8, a32, lo64, hi64, *self._aux)
        return GL(lag_lo, lag_hi)
