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
            meta = getattr(fn, "device_lookup", None)
            if meta is not None:
                if _table_shift(cs.lookup_tables[meta[0]]) is None:
                    return False
                continue
            return False
        return True

    def _build(self, cs, n: int):
        import jax
        import jax.numpy as jnp

        record = cs.resolver.record
        # static per-node data
        nodes = []
        #: raw (values, places) per set_values node — the program INPUTS;
        #: replayable with fresh values via __call__(overrides=...)
        self._set_nodes = []
        v_max = 0
        for fn, ins, outs in record:
            out_idx = places.index_of(np.asarray(outs, np.uint64))
            if out_idx.size:
                v_max = max(v_max, int(out_idx.max()))
            if fn is None:
                self._set_nodes.append((ins.reshape(-1).copy(),
                                        np.asarray(outs, np.uint64)
                                        .reshape(-1).copy()))
                nodes.append(("set", None, out_idx.reshape(-1)))
            else:
                in_idx = places.index_of(np.asarray(ins, np.uint64))
                if in_idx.size:
                    v_max = max(v_max, int(in_idx.max()))
                meta = getattr(fn, "device_lookup", None)
                if meta is not None:
                    tbl_idx, num_keys = meta
                    nodes.append(("lookup", (in_idx, tbl_idx, num_keys),
                                  None))
                else:
                    nodes.append(("twin", (fn.device_twin, in_idx,
                                           ins.shape), out_idx.reshape(-1)))
        V = v_max + 1
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

        node_specs = []
        for kind, info, out_idx in nodes:
            if kind == "set":
                node_specs.append(("set", None, aux(out_idx)))
            elif kind == "twin":
                twin, in_idx, ins_shape = info
                node_specs.append(("twin", (twin, aux(in_idx.reshape(-1)),
                                            ins_shape), aux(out_idx)))
            else:
                in_idx, tbl_idx, num_keys = info
                node_specs.append(("lookup", (aux(in_idx.reshape(-1)),
                                              in_idx.shape, tbl_idx,
                                              num_keys), None))
        table_aux = [(aux(t[0]), aux(t[1])) if t is not None else None
                     for t in tables]
        col_aux = []
        for meta in [copy_meta, wit_meta] + spec_parts:
            idx, ph = meta
            col_aux.append((aux(idx), aux(ph), idx.shape[0]))
        n_set = len(self._set_nodes)

        def prog(*args):
            set_arrays = args[:2 * n_set]
            ax = args[2 * n_set:]
            vlo = jnp.zeros((V,), jnp.uint32)
            vhi = jnp.zeros((V,), jnp.uint32)
            mults = [jnp.zeros((sz,), jnp.uint32) for sz in mult_sizes]
            si = 0
            for kind, info, oi in node_specs:
                if kind == "set":
                    lo_a, hi_a = set_arrays[2 * si], set_arrays[2 * si + 1]
                    si += 1
                    vlo = vlo.at[ax[oi]].set(lo_a)
                    vhi = vhi.at[ax[oi]].set(hi_a)
                elif kind == "twin":
                    twin, ii, ins_shape = info
                    glo = vlo[ax[ii]].reshape(ins_shape)
                    ghi = vhi[ax[ii]].reshape(ins_shape)
                    olo, ohi = twin(glo, ghi)
                    vlo = vlo.at[ax[oi]].set(olo.reshape(-1))
                    vhi = vhi.at[ax[oi]].set(ohi.reshape(-1))
                else:  # lookup multiplicity count
                    ii, ins_shape, tbl_idx, num_keys = info
                    keys = vlo[ax[ii]].reshape(ins_shape)
                    s = self._table_shifts[tbl_idx]
                    packed = keys[0]
                    for i in range(1, num_keys):
                        packed = (packed << jnp.uint32(s)) | keys[i]
                    ski, ori = table_aux[tbl_idx]
                    pos = jnp.searchsorted(ax[ski], packed)
                    rows = ax[ori][pos]
                    mults[tbl_idx] = mults[tbl_idx].at[rows].add(1)

            outs = []
            for (ci, pi, k_cols) in col_aux:
                if k_cols == 0:
                    z = jnp.zeros((0, n), jnp.uint32)
                    outs += [z, z]
                    continue
                outs.append(jnp.where(ax[pi], jnp.uint32(0), vlo[ax[ci]]))
                outs.append(jnp.where(ax[pi], jnp.uint32(0), vhi[ax[ci]]))
            if has_mult:
                pad = n - sum(mult_sizes)
                mult_col = jnp.concatenate(
                    mults + [jnp.zeros((pad,), jnp.uint32)])
                outs += [mult_col, jnp.zeros((n,), jnp.uint32)]
            return tuple(outs)

        self._prog = jax.jit(prog)
        self._n_spec_parts = len(spec_parts)
        self._has_wit = wit_meta[0].shape[0] > 0
        self._has_mult = has_mult

    def __call__(self, overrides: dict = None):
        """Run the device program -> (vars GL (n, k_var), wits GL, mult GL).

        ``overrides`` maps input PLACES to new values (the replay_witness
        contract, cs/resolver.py): only the few-kB input arrays change;
        everything else recomputes on device."""
        import jax.numpy as jnp

        args = []
        for vals, plcs in self._set_nodes:
            if overrides:
                vals = vals.copy()
                for j, p in enumerate(plcs):
                    if int(p) in overrides:
                        vals[j] = overrides[int(p)]
            args.extend(_limbs(vals))
        outs = self._prog(*args, *self._aux)
        i = 0

        def take():
            nonlocal i
            lo, hi = outs[i], outs[i + 1]
            i += 2
            return GL(lo, hi)

        copy_cols = take()
        wit_cols = take()
        specs = [take() for _ in range(self._n_spec_parts)]
        parts = [copy_cols] + specs
        var_lo = jnp.concatenate([p.lo for p in parts], axis=0)
        var_hi = jnp.concatenate([p.hi for p in parts], axis=0)
        mult = None
        if self._has_mult:
            mlo, mhi = outs[i], outs[i + 1]
            mult = GL(mlo[None, :], mhi[None, :])
        return (GL(var_lo, var_hi), wit_cols, mult)
