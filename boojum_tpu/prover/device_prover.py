"""Device-resident prove(): the TPU path.

Mirrors prover.prove stage by stage (same transcript order, oracle layouts,
challenge derivations — a proof produced here is BIT-IDENTICAL to the host
path's, asserted in tests), but bulk polynomial math stays on device:

- oracles are DeviceOracle (LDEs never leave the device; Merkle hash layers
  and batched query gathers are the only transfers);
- stage math composes the medium-grained jitted primitives in jit_ops (each
  compiles once per shape — avoids the pathological XLA compile times of
  monolithic stage graphs) plus one per-gate-repetition jit;
- challenges ride as (2,2)/(T,2,2) u32 arrays, so nothing recompiles across
  proofs.
"""

from __future__ import annotations

import functools

import numpy as np

from ..cs.cs import ConstraintSystem
from ..cs.gates.base import GLOps, TraceView
from ..cs.setup import non_residues_for_copy_permutation
from ..field import extension as ext2
from ..field import goldilocks as gl
from ..field.goldilocks import GL
from ..transcript import make_transcript
from ..utils import npgl
from . import device, pow as pow_mod
from .fri import compute_fri_schedule, do_fri
from .jit_ops import EV, jaffine, jbase_mul, jbase_one_minus, scalar_ext
from .oracles import DeviceOracle
from .proof import Proof, ProofConfig, SingleRoundQueries
from .prover import (ProvingArtifacts, _BoolsBuffer, _s2, _u64_from_lsb,
                     materialize_witness_columns)

P = npgl.ORDER


def create_device_setup(cs, setup_base, proof_config, hasher="poseidon2",
                        mesh=None):
    """Device-resident setup oracle + VK (cap identical to the host path —
    the tree is the same; only where the layers live differs)."""
    from .prover import make_vk

    cols = np.concatenate([setup_base.copy_permutation_polys,
                           setup_base.constant_columns,
                           setup_base.lookup_tables_columns], axis=0)
    lde = max(proof_config.fri_lde_factor, setup_base.quotient_degree)
    if mesh is not None:
        from ..parallel.sharded_oracle import ShardedOracle
        oracle = ShardedOracle(cols, lde, proof_config.merkle_tree_cap_size,
                               hasher, mesh,
                               tree_lde=proof_config.fri_lde_factor)
    else:
        oracle = DeviceOracle(cols, lde, proof_config.merkle_tree_cap_size,
                              hasher, tree_lde=proof_config.fri_lde_factor)
    vk = make_vk(cs, setup_base, proof_config, oracle.get_cap())
    return ProvingArtifacts(setup_base=setup_base, setup_oracle=oracle,
                            vk=vk)


class DeviceProver:
    def __init__(self, cs: ConstraintSystem, artifacts: ProvingArtifacts,
                 proof_config: ProofConfig, mesh=None, fuse=None):
        """mesh: optional 1-D jax.sharding.Mesh — when given, oracles, NTTs,
        the grand-product scan and Merkle trees run sharded over the mesh
        (the multi-chip path, BASELINE configs[4]); proof bytes are identical
        to the single-device path.

        fuse: build each quotient phase (all lookup terms / all repetitions
        of a gate / all copy-permutation relations) as ONE jit program —
        fewer dispatches over the device tunnel. Defaults to on for
        accelerator backends, off on CPU where XLA compile time for the
        wide fused carry-chain graphs is pathological (minutes on a small
        host); the fused and rolled paths produce byte-identical proofs
        (tests/test_prove_verify.py::test_fused_quotient_matches_rolled)."""
        import jax
        self.mesh = mesh
        if fuse is None:
            fuse = jax.default_backend() != "cpu"
        # fused phase programs under a mesh run fine through GSPMD on
        # accelerator backends (validated byte-identical on-chip with a
        # 1-device mesh); XLA:CPU's partitioned compile of the wide fused
        # carry-chain graphs is pathological (hours), so the virtual-CPU-mesh
        # path keeps the rolled programs
        self.fuse = fuse and (mesh is None
                              or jax.default_backend() != "cpu")
        sb = artifacts.setup_base
        self.cs = cs
        self.artifacts = artifacts
        self.cfg = proof_config
        self.n = sb.domain_size
        self.qd = sb.quotient_degree
        self.fri_lde = proof_config.fri_lde_factor
        geometry = cs.geometry
        lp = cs.lookup_parameters
        self.num_var = (geometry.num_columns_under_copy_permutation
                        + (cs.specialized_copy_data.shape[0]
                           if cs.specialized_copy_data is not None else 0)
                        + (cs.gate_spec_data.shape[0]
                           if cs.gate_spec_data is not None else 0))
        self.num_wit = geometry.num_witness_columns
        self.num_mult = 1 if lp.lookup_is_allowed else 0
        self.num_const = sb.constant_columns.shape[0]
        self.num_table = sb.lookup_tables_columns.shape[0]
        self.num_intermediates = max(-(-self.num_var // self.qd) - 1, 0)
        self.non_res = non_residues_for_copy_permutation(self.n, self.num_var)
        self._gate_jits = {}
        # device arrays that do not depend on the witness or transcript —
        # uploaded/computed once, reused by every prove() on this instance
        self._prove_invariant = {}

    def _make_oracle(self, cols_u64, lde, cap_size, hasher, tree_lde=None,
                     monomials=None):
        if self.mesh is not None:
            from ..parallel.sharded_oracle import ShardedOracle
            return ShardedOracle(cols_u64, lde, cap_size, hasher,
                                 self.mesh, tree_lde=tree_lde,
                                 monomials=monomials)
        return DeviceOracle(cols_u64, lde, cap_size, hasher,
                            tree_lde=tree_lde, monomials=monomials)

    # -- per-gate-repetition jit --------------------------------------------

    def _gate_rep_fn(self, ev):
        if ev.name in self._gate_jits:
            return self._gate_jits[ev.name]
        import jax

        def fn(var_cols_lo, var_cols_hi, wit_cols_lo, wit_cols_hi,
               const_cols_lo, const_cols_hi):
            vars_ = [GL(l, h) for l, h in zip(var_cols_lo, var_cols_hi)]
            wits = [GL(l, h) for l, h in zip(wit_cols_lo, wit_cols_hi)]
            consts = [GL(l, h) for l, h in zip(const_cols_lo, const_cols_hi)]
            src = TraceView(vars_, wits, consts)
            terms = ev.evaluate(src, GLOps)
            out = []
            for t in terms:
                out.append(t.lo)
                out.append(t.hi)
            return out

        j = jax.jit(fn)
        self._gate_jits[ev.name] = j
        return j

    # -- fused per-gate sweep: all repetitions of one gate in one program ----

    def _gate_sweep_fn(self, ev, reps, path_len, base_var, base_wit,
                       base_const, spec_base=None, trans=False):
        key = (ev.name, reps, path_len, base_var, base_wit, base_const,
               spec_base, trans)
        if key in self._gate_jits:
            return self._gate_jits[key]
        import jax
        j = jax.jit(_gate_sweep_body(ev, reps, base_var, base_wit,
                                     base_const, spec_base, trans=trans))
        self._gate_jits[key] = j
        return j

    # -- fused full-quotient program -----------------------------------------

    def _quotient_full_fn(self):
        """ONE jitted program for the ENTIRE quotient stage: lookup terms,
        every gate sweep (selector products traced inline), copy-permutation
        boundary+recurrences, vanishing division, the full-domain coset iNTT
        and the (n, 2qd) monomial re-layout. Replaces ~12 executables + ~20
        eager EV-op dispatches — cold start pays ~1-4 s PER executable to
        load over the device tunnel (round-3 cold prove was 502 s), and warm
        dispatch latency is ~20-40 ms each."""
        key = "__quotient_full__"
        if key in self._gate_jits:
            return self._gate_jits[key]
        import jax
        import jax.numpy as jnp

        cs, sb = self.cs, self.artifacts.setup_base
        geometry = cs.geometry
        lp = cs.lookup_parameters
        n, qd = self.n, self.qd
        size = qd * n
        num_lookup_subargs = lp.num_sublookup_arguments_for_geometry(geometry)
        num_rel = self.num_intermediates + 1
        a_off = 2 * (1 + self.num_intermediates)
        lookup_spec_cols = cs.specialized_copy_data.shape[0] \
            if cs.specialized_copy_data is not None else 0

        lookup_body = None
        lookup_has_sel = False
        n_lk = 0
        if lp.lookup_is_allowed:
            width = lp.lookup_width()
            if lp.is_specialized:
                pw = lp.specialized_columns_per_repetition()
                base_off = geometry.num_columns_under_copy_permutation
            else:
                pw = lp.columns_per_subargument()
                base_off = 0
                lookup_has_sel = True
            lookup_body = _lookup_quotient_body(
                size, num_lookup_subargs, width, pw, base_off, a_off,
                bool(lp.id_in_constant), lookup_has_sel, self.num_table,
                tuple(self.num_var + i for i in sb.table_ids_column_idxes)
                if lp.id_in_constant else (0,),
                self.num_var + self.num_const,
                self.num_var + self.num_wit)  # f transposes at entry
            n_lk = num_lookup_subargs + 1

        spec_sweeps = []  # (body, n_terms)
        for (snm, sstart, sreps) in cs.gate_spec_layout:
            sev = cs.evaluators_specialized[cs.specialized_idx_by_name[snm]]
            base = geometry.num_columns_under_copy_permutation \
                + lookup_spec_cols + sstart
            spec_sweeps.append((_gate_sweep_body(sev, sreps, 0, 0, 0,
                                                 spec_base=base),
                                sev.num_quotient_terms * sreps))
        gen_sweeps = []  # (body, path, n_terms)
        for ev_idx, ev in enumerate(cs.evaluators_general):
            if ev.num_quotient_terms == 0:
                continue
            path = tuple(sb.selector_paths[ev_idx])
            reps = ev.num_repetitions(geometry)
            gen_sweeps.append((_gate_sweep_body(
                ev, reps, 0, self.num_var, self.num_var + len(path)),
                path, ev.num_quotient_terms * reps))
        cp_body = _copyperm_quotient_body(size, n, qd, self.num_var,
                                          self.num_intermediates)
        intt = _intt_coset_body(size.bit_length() - 1)
        num_var = self.num_var

        def f(w_lo, w_hi, s_lo, s_hi, g2_lo, g2_hi, x_lo, x_hi, nrl, nrh,
              zs0l, zs0h, zs1l, zs1h, l1_lo, l1_hi, van_lo, van_hi,
              beta, gamma, lbeta, gpow, alphas):
            # inputs arrive TRANSPOSED (k, size) — the oracle's canonical
            # layout; XLA folds the transpose into each column read, turning
            # strided (128x-wasteful) column loads into contiguous row loads
            w_lo, w_hi = w_lo.T, w_hi.T
            s_lo, s_hi = s_lo.T, s_hi.T
            g2_lo, g2_hi = g2_lo.T, g2_hi.T
            sel_cache = {}

            def selector_product(path):
                if path not in sel_cache:
                    prod = None
                    for k_, bit in enumerate(path):
                        c = GL(s_lo[:, num_var + k_], s_hi[:, num_var + k_])
                        if not bit:
                            c = gl.sub(gl.ones((size,)), c)
                        prod = c if prod is None else gl.mul(prod, c)
                    if prod is None:
                        prod = gl.ones((size,))
                    sel_cache[path] = prod
                return sel_cache[path]

            acc0 = gl.zeros((size,))
            acc1 = gl.zeros((size,))
            ai = 0
            if lookup_body is not None:
                if lookup_has_sel:
                    sel = selector_product(tuple(sb.selector_paths[0]))
                    sl_, sh_ = sel.lo, sel.hi
                else:
                    sl_ = sh_ = jnp.zeros((size,), jnp.uint32)
                out = lookup_body(w_lo, w_hi, s_lo, s_hi, g2_lo, g2_hi,
                                  sl_, sh_, lbeta, gpow,
                                  alphas[ai:ai + n_lk])
                acc0 = gl.add(acc0, GL(out[0], out[1]))
                acc1 = gl.add(acc1, GL(out[2], out[3]))
                ai += n_lk
            ones = gl.ones((size,))
            for body, n_terms in spec_sweeps:
                out = body(w_lo, w_hi, s_lo, s_hi, ones.lo, ones.hi,
                           alphas[ai:ai + n_terms])
                acc0 = gl.add(acc0, GL(out[0], out[1]))
                acc1 = gl.add(acc1, GL(out[2], out[3]))
                ai += n_terms
            for body, path, n_terms in gen_sweeps:
                sel = selector_product(path)
                out = body(w_lo, w_hi, s_lo, s_hi, sel.lo, sel.hi,
                           alphas[ai:ai + n_terms])
                acc0 = gl.add(acc0, GL(out[0], out[1]))
                acc1 = gl.add(acc1, GL(out[2], out[3]))
                ai += n_terms
            out = cp_body(w_lo, w_hi, s_lo, s_hi, x_lo, x_hi, nrl, nrh,
                          g2_lo, g2_hi, zs0l, zs0h, zs1l, zs1h,
                          l1_lo, l1_hi, beta, gamma,
                          alphas[ai:ai + 1 + num_rel])
            acc0 = gl.add(acc0, GL(out[0], out[1]))
            acc1 = gl.add(acc1, GL(out[2], out[3]))
            # vanishing division + coset iNTT + (n, 2qd) monomial layout
            van = GL(van_lo, van_hi)
            acc0 = gl.mul(acc0, van)
            acc1 = gl.mul(acc1, van)
            both = intt(GL(jnp.stack([acc0.lo, acc1.lo], axis=1),
                           jnp.stack([acc0.hi, acc1.hi], axis=1)))
            q0l = both.lo[:, 0].reshape(qd, n)
            q0h = both.hi[:, 0].reshape(qd, n)
            q1l = both.lo[:, 1].reshape(qd, n)
            q1h = both.hi[:, 1].reshape(qd, n)
            out_lo = jnp.stack([q0l, q1l], axis=1).reshape(2 * qd, n).T
            out_hi = jnp.stack([q0h, q1h], axis=1).reshape(2 * qd, n).T
            return out_lo, out_hi

        j = jax.jit(f)
        self._gate_jits[key] = (j, n_lk + sum(t for _, t in spec_sweeps)
                                + sum(t for _, _, t in gen_sweeps)
                                + 1 + num_rel)
        return self._gate_jits[key]

    def _quotient_rolled(self, w_flat, s_flat, g2_flat, x_lde, l1, vanish,
                         z_shift, size, total_terms, num_lookup_subargs,
                         width, pw, base_off, alpha_arrs, gpow_a, beta_a,
                         gamma_a, lookup_beta, use_dev_ts=False,
                         alpha_table=None, lbeta_a=None, gpow_arr_dev=None):
        """Per-phase quotient accumulation (the pre-round-4 path): one
        program per phase when self.fuse (the mesh path and the CPU fused
        configuration, incl. the device transcript where the challenge
        tables are device arrays), else one dispatch per gate repetition.
        The single-device accelerator path uses _quotient_full_fn instead."""
        import jax.numpy as jnp

        cs, sb = self.cs, self.artifacts.setup_base
        lp = cs.lookup_parameters
        geometry = cs.geometry
        n, qd = self.n, self.qd
        nrl, nrh = self._prove_invariant["nr_limbs"]
        # single-device oracles store flats TRANSPOSED (k, size)
        trans = self.mesh is None

        def fcol(m, j):
            if trans:
                return m.lo[j], m.hi[j]
            return m.lo[:, j], m.hi[:, j]

        def fcols2(m, i0, i1):
            if trans:
                return EV(m.lo[i0], m.hi[i0], m.lo[i1], m.hi[i1])
            return EV(m.lo[:, i0], m.hi[:, i0], m.lo[:, i1], m.hi[:, i1])

        if use_dev_ts:
            def alpha_slice(start, count):
                return alpha_table[start:start + count]
        else:
            def alpha_slice(start, count):
                return jnp.asarray(np.stack(alpha_arrs[start:start + count]))

        if lbeta_a is None:
            lbeta_a = scalar_ext(lookup_beta)
        acc = EV.const((0, 0), (size,))
        ai = 0
        from .jit_ops import (jext_mul_base, jext_sub_one_c0, jscale_base,
                              jext_scale)

        if lp.lookup_is_allowed:
            if lp.is_specialized:
                sel_flat = None
            else:
                marker_path = sb.selector_paths[0]
                sel_flat = gl.ones((size,)).astuple()
                for k_, bit in enumerate(marker_path):
                    c_lo, c_hi = fcol(s_flat, self.num_var + k_)
                    if not bit:
                        c_lo, c_hi = jbase_one_minus(c_lo, c_hi)
                    sel_flat = jbase_mul(sel_flat[0], sel_flat[1], c_lo, c_hi)
            a_off = 2 * (1 + self.num_intermediates)
            if self.fuse:
                # all lookup terms in one program
                lk = _lookup_quotient_jit(
                    size, num_lookup_subargs, width, pw, base_off, a_off,
                    bool(lp.id_in_constant), sel_flat is not None,
                    self.num_table,
                    tuple(self.num_var + i
                          for i in sb.table_ids_column_idxes)
                    if lp.id_in_constant else (0,),
                    self.num_var + self.num_const,
                    self.num_var + self.num_wit, trans)
                n_lk = num_lookup_subargs + 1
                lk_alphas = alpha_slice(ai, n_lk)
                zero_s = jnp.zeros((size,), jnp.uint32)
                out = lk(w_flat.lo, w_flat.hi, s_flat.lo, s_flat.hi,
                         g2_flat.lo, g2_flat.hi,
                         sel_flat[0] if sel_flat is not None else zero_s,
                         sel_flat[1] if sel_flat is not None else zero_s,
                         jnp.asarray(lbeta_a),
                         gpow_arr_dev if use_dev_ts
                         else jnp.asarray(np.stack(gpow_a)), lk_alphas)
                acc = acc + EV(*out)
                ai += n_lk
            else:
                for rep in range(num_lookup_subargs):
                    agg = EV.const(lookup_beta, (size,))
                    for i in range(pw):
                        c_lo, c_hi = fcol(w_flat, base_off + rep * pw + i)
                        agg = agg + EV(*jscale_base(c_lo, c_hi, gpow_a[i]))
                    if lp.id_in_constant:
                        idxes = sb.table_ids_column_idxes
                        tid_idx = self.num_var + \
                            idxes[min(rep, len(idxes) - 1)]
                        t_lo, t_hi = fcol(s_flat, tid_idx)
                        agg = agg + EV(*jscale_base(t_lo, t_hi, gpow_a[width]))
                    a_poly = fcols2(g2_flat, a_off + 2 * rep,
                                    a_off + 2 * rep + 1)
                    prod = a_poly * agg
                    if sel_flat is None:
                        term = EV(*jext_sub_one_c0(*prod.a))
                    else:
                        z_ = jnp.zeros_like(sel_flat[0])
                        term = prod - EV(sel_flat[0], sel_flat[1], z_, z_)
                    acc = acc + term.scale(alpha_arrs[ai])
                    ai += 1
                agg_t = EV.const(lookup_beta, (size,))
                tbl_base = self.num_var + self.num_const
                for i in range(self.num_table):
                    t_lo, t_hi = fcol(s_flat, tbl_base + i)
                    agg_t = agg_t + EV(*jscale_base(t_lo, t_hi, gpow_a[i]))
                b_off = a_off + 2 * num_lookup_subargs
                b_poly = fcols2(g2_flat, b_off, b_off + 1)
                term = b_poly * agg_t
                m_lo, m_hi = fcol(w_flat, self.num_var + self.num_wit)
                mz = jnp.zeros_like(m_lo)
                term = term - EV(m_lo, m_hi, mz, mz)
                acc = acc + term.scale(alpha_arrs[ai])
                ai += 1

        # general gates × selector products
        sel_cache = {}

        def selector_product(path):
            key = tuple(path)
            if key not in sel_cache:
                prod = None
                for k, bit in enumerate(path):
                    c_lo, c_hi = fcol(s_flat, self.num_var + k)
                    if not bit:
                        c_lo, c_hi = jbase_one_minus(c_lo, c_hi)
                    prod = (c_lo, c_hi) if prod is None else \
                        jbase_mul(prod[0], prod[1], c_lo, c_hi)
                if prod is None:
                    ones = gl.ones((size,))
                    prod = (ones.lo, ones.hi)
                sel_cache[key] = prod
            return sel_cache[key]

        lookup_spec_cols = cs.specialized_copy_data.shape[0] \
            if cs.specialized_copy_data is not None else 0
        ones_s = gl.ones((size,))
        for (snm, sstart, sreps) in cs.gate_spec_layout:
            sev = cs.evaluators_specialized[cs.specialized_idx_by_name[snm]]
            base = geometry.num_columns_under_copy_permutation \
                + lookup_spec_cols + sstart
            n_terms = sev.num_quotient_terms * sreps
            if self.fuse:
                sweep = self._gate_sweep_fn(sev, sreps, 0, 0, 0, 0,
                                            spec_base=base, trans=trans)
                al = alpha_slice(ai, n_terms)
                out = sweep(w_flat.lo, w_flat.hi, s_flat.lo, s_flat.hi,
                            ones_s.lo, ones_s.hi, al)
                acc = acc + EV(*out)
                ai += n_terms
            else:
                rep_fn = self._gate_rep_fn(sev)
                for rep in range(sreps):
                    cols = [fcol(w_flat, base + rep * sev.num_variables + i)
                            for i in range(sev.num_variables)]
                    terms = rep_fn([c[0] for c in cols], [c[1] for c in cols],
                                   [], [], [], [])
                    for t_i in range(len(terms) // 2):
                        t_lo, t_hi = terms[2 * t_i], terms[2 * t_i + 1]
                        acc = acc + EV(*jscale_base(t_lo, t_hi, alpha_arrs[ai]))
                        ai += 1

        for ev_idx, ev in enumerate(cs.evaluators_general):
            if ev.num_quotient_terms == 0:
                continue
            path = sb.selector_paths[ev_idx]
            sel = selector_product(path)
            reps = ev.num_repetitions(geometry)
            n_terms = ev.num_quotient_terms * reps
            if self.fuse:
                sweep = self._gate_sweep_fn(
                    ev, reps, len(path), 0, self.num_var,
                    self.num_var + len(path), trans=trans)
                al = alpha_slice(ai, n_terms)
                out = sweep(w_flat.lo, w_flat.hi, s_flat.lo, s_flat.hi,
                            sel[0], sel[1], al)
                acc = acc + EV(*out)
                ai += n_terms
                continue
            rep_fn = self._gate_rep_fn(ev)
            dv, dw, dc = ev.per_chunk_offset
            for rep in range(reps):
                var_cols = [fcol(w_flat, rep * dv + i)
                            for i in range(ev.num_variables)]
                wit_cols = [fcol(w_flat, self.num_var + rep * dw + i)
                            for i in range(ev.num_witnesses)]
                const_cols = [fcol(s_flat, self.num_var + len(path) + rep * dc + i)
                              for i in range(max(ev.num_constants,
                                                 _consts_read(ev)))]
                terms = rep_fn([c[0] for c in var_cols], [c[1] for c in var_cols],
                               [c[0] for c in wit_cols], [c[1] for c in wit_cols],
                               [c[0] for c in const_cols],
                               [c[1] for c in const_cols])
                for t_i in range(len(terms) // 2):
                    t_lo, t_hi = terms[2 * t_i], terms[2 * t_i + 1]
                    c_lo, c_hi = jbase_mul(t_lo, t_hi, sel[0], sel[1])
                    acc = acc + EV(*jscale_base(c_lo, c_hi, alpha_arrs[ai]))
                    ai += 1

        # copy-permutation boundary + recurrences


        num_rel = self.num_intermediates + 1
        if self.fuse:
            # boundary + all recurrence relations in one program
            cp = _copyperm_quotient_jit(size, n, qd, self.num_var,
                                        self.num_intermediates, trans)
            cp_alphas = alpha_slice(ai, 1 + num_rel)
            out = cp(w_flat.lo, w_flat.hi, s_flat.lo, s_flat.hi,
                     x_lde.lo, x_lde.hi, nrl, nrh,
                     g2_flat.lo, g2_flat.hi,
                     z_shift.a[0], z_shift.a[1], z_shift.a[2], z_shift.a[3],
                     l1.lo, l1.hi, jnp.asarray(beta_a), jnp.asarray(gamma_a),
                     cp_alphas)
            acc = acc + EV(*out)
            ai += 1 + num_rel
        else:
            z_flat = fcols2(g2_flat, 0, 1)
            zm1 = EV(*jext_sub_one_c0(*z_flat.a))
            acc = acc + EV(*jext_mul_base(*zm1.a, l1.lo, l1.hi)) \
                .scale(alpha_arrs[ai])
            ai += 1
            inters = [fcols2(g2_flat, 2 + 2 * i, 3 + 2 * i)
                      for i in range(self.num_intermediates)]
            lhs_list = inters + [z_shift]
            rhs_list = [z_flat] + inters
            for rel_idx, (lhs, rhs) in enumerate(zip(lhs_list, rhs_list)):
                lhs_acc, rhs_acc = lhs, rhs
                for j in range(rel_idx * qd,
                               min((rel_idx + 1) * qd, self.num_var)):
                    w_lo, w_hi = fcol(w_flat, j)
                    sg_lo, sg_hi = fcol(s_flat, j)
                    den = EV(*jaffine(w_lo, w_hi, sg_lo, sg_hi, beta_a, gamma_a))
                    nr = scalar_ext((self.non_res[j], 0))
                    bx_lo, bx_hi = jbase_mul(
                        x_lde.lo, x_lde.hi,
                        jnp.broadcast_to(jnp.uint32(nr[0, 0]), (size,)),
                        jnp.broadcast_to(jnp.uint32(nr[0, 1]), (size,)))
                    num_ = EV(*jaffine(w_lo, w_hi, bx_lo, bx_hi, beta_a, gamma_a))
                    lhs_acc = lhs_acc * den
                    rhs_acc = rhs_acc * num_
                acc = acc + (lhs_acc - rhs_acc).scale(alpha_arrs[ai])
                ai += 1
        assert ai == total_terms

        # vanishing division + full-domain iNTT -> quotient monomials
        acc = EV(*jext_mul_base(*acc.a, vanish.lo, vanish.hi))
        plan_log = size.bit_length() - 1
        both = _intt_coset_jit(plan_log)(
            GL(jnp.stack([acc.a[0], acc.a[2]], axis=1),
               jnp.stack([acc.a[1], acc.a[3]], axis=1)))
        q0 = GL(both.lo[:, :1], both.hi[:, :1])
        q1 = GL(both.lo[:, 1:], both.hi[:, 1:])
        if cs.config.runtime_asserts:
            top0 = int(np.asarray(q0.lo[-1, 0])) | \
                (int(np.asarray(q0.hi[-1, 0])) << 32)
            top1 = int(np.asarray(q1.lo[-1, 0])) | \
                (int(np.asarray(q1.hi[-1, 0])) << 32)
            if top0 != 0 or top1 != 0:
                # DEBUG_SATISFIABLE analogue (reference src/config.rs:7)
                cs.check_if_satisfied(verbose=True)
                raise AssertionError(
                    "unsatisfied circuit (see row report above)")

        qcols_lo, qcols_hi = [], []
        for k in range(qd):
            qcols_lo.append(q0.lo[k * n:(k + 1) * n, 0])
            qcols_hi.append(q0.hi[k * n:(k + 1) * n, 0])
            qcols_lo.append(q1.lo[k * n:(k + 1) * n, 0])
            qcols_hi.append(q1.hi[k * n:(k + 1) * n, 0])
        q_monos = GL(jnp.stack(qcols_lo, axis=1), jnp.stack(qcols_hi, axis=1))
        return q_monos

    # -- the prove pipeline --------------------------------------------------

    def prove(self, transcript_kind="poseidon", hasher="poseidon2",
              verbose: bool = False, device_transcript: bool = None) -> Proof:
        import sys as _sys
        import time as _time
        import jax.numpy as jnp

        _t = [_time.time()]
        #: per-stage wall-clock split of the most recent verbose prove
        #: (synced attribution — see _sync), for bench/profiling consumers
        self.last_stage_times = {}

        def _stage(label):
            if verbose:
                now = _time.time()
                self.last_stage_times[label.strip()] = round(now - _t[0], 3)
                print("[dev-prove] %-24s %.2fs" % (label, now - _t[0]),
                      file=_sys.stderr, flush=True)
                _t[0] = now

        def _sync(label, *arrays):
            # fine-grained attribution: JAX dispatch is async, so without a
            # sync the cost of a step shows up at the NEXT blocking point
            if verbose:
                import jax
                for a in arrays:
                    jax.block_until_ready(a)
                _stage("  " + label)

        cs = self.cs
        sb = self.artifacts.setup_base
        setup_oracle = self.artifacts.setup_oracle
        vk = self.artifacts.vk
        cfg = self.cfg
        n, qd, fri_lde = self.n, self.qd, self.fri_lde
        used_lde = max(fri_lde, qd)
        cap_size = cfg.merkle_tree_cap_size
        lp = cs.lookup_parameters
        geometry = cs.geometry
        omega = gl.domain_generator(n.bit_length() - 1)
        num_lookup_subargs = lp.num_sublookup_arguments_for_geometry(geometry)

        # device-resident transcript: challenges stay on device, so the
        # prove submits as one async chain with only TWO host syncs (the
        # PoW/query handoff + the final proof fetch) instead of ~10 protocol
        # syncs at ~31 ms tunnel round-trip each. Byte-identical proofs
        # (tests/test_prove_verify.py::test_device_transcript_byte_identical).
        use_dev_ts = (transcript_kind in ("poseidon", "poseidon2")
                      and self.mesh is None and self.fuse
                      and hasher == "poseidon2")
        if device_transcript is not None:
            assert not (device_transcript and not use_dev_ts), (
                "device transcript needs an algebraic transcript kind, "
                "fuse=True, mesh=None and the poseidon2 hasher")
            use_dev_ts = use_dev_ts and device_transcript
        if use_dev_ts:
            from .device_transcript import (DeviceTranscript, ext_mul_dev,
                                            ext_pow_table_dev)
            transcript = DeviceTranscript(transcript_kind)
        else:
            transcript = make_transcript(transcript_kind)
        transcript.witness_merkle_tree_cap(vk.setup_merkle_tree_cap)

        def absorb_cap(oracle):
            """Absorb an oracle cap: device layer under the device
            transcript (no sync), host ints otherwise."""
            if use_dev_ts and hasattr(oracle.tree, "layers"):
                transcript.witness_merkle_tree_cap_dev(
                    GL(*oracle.tree.layers[-1]))
            else:
                transcript.witness_merkle_tree_cap(oracle.get_cap())

        # on-device witness materialization: when every resolver node has a
        # device twin (reference take_witness_using_hints parity,
        # src/cs/implementations/witness.rs:325), the whole witness program
        # runs on-chip and only the kB-scale circuit inputs cross the tunnel
        # (the ~30 MB column upload dominated the round-3 stage split)
        if "dev_witness" not in self._prove_invariant:
            from .device_witness import DeviceWitnessProgram
            self._prove_invariant["dev_witness"] = (
                DeviceWitnessProgram(cs, n)
                if self.mesh is None and DeviceWitnessProgram.supported(cs)
                else None)
        dev_witness = self._prove_invariant["dev_witness"]
        if dev_witness is not None:
            publics = []  # DeviceWitnessProgram.supported excludes publics
            public_values = []
            transcript.witness_field_elements(public_values)
            lagrange_dev = dev_witness(getattr(cs, "witness_overrides", None))
            _sync("witness materialize", lagrange_dev.lo)
            witness_oracle = DeviceOracle(None, used_lde, cap_size, hasher,
                                          tree_lde=fri_lde,
                                          lagrange_dev=lagrange_dev)
            if verbose and hasattr(witness_oracle.tree, "layers"):
                _sync("witness commit", witness_oracle.tree.layers[-1][0])
        else:
            variables_cols, witness_cols, mult_cols = \
                materialize_witness_columns(cs, n)
            publics = []
            for (col, row) in cs.public_inputs:
                publics.append((col, row, int(variables_cols[col, row])))
            public_values = [v for (_, _, v) in publics]
            transcript.witness_field_elements(public_values)

            _sync("witness materialize")
            witness_src = np.concatenate(
                [variables_cols, witness_cols, mult_cols], axis=0)
            witness_oracle = self._make_oracle(witness_src, used_lde,
                                               cap_size, hasher,
                                               tree_lde=fri_lde)
        absorb_cap(witness_oracle)

        _stage("witness oracle")
        if use_dev_ts:
            beta_arr = transcript.get_ext_challenge()
            gamma_arr = transcript.get_ext_challenge()
            zero22 = np.zeros((2, 2), np.uint32)
            lbeta_arr = lgamma_arr = zero22
            gpow_arr_dev = np.zeros((1, 2, 2), np.uint32)
            gpow_arr_dev[0, 0, 0] = 1  # gamma^0
            if lp.lookup_is_allowed:
                lbeta_arr = transcript.get_ext_challenge()
                lgamma_arr = transcript.get_ext_challenge()
                gpow_arr_dev = ext_pow_table_dev(lgamma_arr,
                                                 self.num_table + 1)
            beta_a, gamma_a, lbeta_a = beta_arr, gamma_arr, lbeta_arr
            # per-power list entries are only read by the mesh / non-fused
            # paths, which the device transcript excludes
            gpow_a = None
        else:
            beta = _s2(tuple(transcript.get_multiple_challenges(2)))
            gamma = _s2(tuple(transcript.get_multiple_challenges(2)))
            lookup_beta = (0, 0)
            lookup_gamma = (0, 0)
            if lp.lookup_is_allowed:
                lookup_beta = _s2(tuple(transcript.get_multiple_challenges(2)))
                lookup_gamma = _s2(tuple(transcript.get_multiple_challenges(2)))
            gamma_pows_list = [(1, 0)]
            for _ in range(self.num_table):
                gamma_pows_list.append(
                    ext2.s2_mul(gamma_pows_list[-1], lookup_gamma))

            beta_a = scalar_ext(beta)
            gamma_a = scalar_ext(gamma)
            lbeta_a = scalar_ext(lookup_beta)
            gpow_a = [scalar_ext(c) for c in gamma_pows_list]

        # -- stage 2+3 on the base domain -----------------------------------
        # base-domain columns are SLICED from the oracles' retained device
        # copies (zero transfer); prove-invariant arrays (x powers, sigmas
        # when the oracle has no device copy) are cached across proves —
        # the tunnel sustains only ~8-10 MB/s, so per-prove re-uploads of
        # the ~75 MB vars+sigmas dominated the stage (round-2 profiling)
        wl = getattr(witness_oracle, "lagrange", None)
        if wl is not None:
            vars_dev = GL(wl.lo[:, :self.num_var], wl.hi[:, :self.num_var])
        else:
            vars_dev = device.to_device_cols(variables_cols)
        sl = getattr(setup_oracle, "lagrange", None)
        if sl is not None:
            sig_dev = GL(sl.lo[:, :self.num_var], sl.hi[:, :self.num_var])
        elif "sig_dev" in self._prove_invariant:
            sig_dev = self._prove_invariant["sig_dev"]
        else:
            sig_dev = device.to_device_cols(sb.copy_permutation_polys)
            self._prove_invariant["sig_dev"] = sig_dev
        if "x_dev" in self._prove_invariant:
            x_dev = self._prove_invariant["x_dev"]
        else:
            x_dev = gl.from_u64(npgl.powers(omega, n))
            self._prove_invariant["x_dev"] = x_dev
        # with the device witness program this sync point drains the witness
        # materialization + witness-oracle commit (no uploads remain)
        _sync("s2 inputs ready", vars_dev.lo, sig_dev.lo, x_dev.lo)

        def col(m, j):
            return m.lo[:, j], m.hi[:, j]

        # lookup configuration (shared with the quotient stage below)
        width = pw = base_off = 0
        sel_base = None
        tbl_dev = tid_dev = mult_dev = None
        if lp.lookup_is_allowed:
            width = lp.lookup_width()

            def _setup_slice(a, b):
                if sl is not None:
                    return GL(sl.lo[:, a:b], sl.hi[:, a:b])
                return None

            if lp.is_specialized:
                pw = lp.specialized_columns_per_repetition()
                base_off = geometry.num_columns_under_copy_permutation
            else:
                pw = lp.columns_per_subargument()
                base_off = 0
                # general-purpose: A_i = sel/agg_i; sel = marker selector
                # product over base-domain constant columns
                if "sel_base" in self._prove_invariant:
                    sel_base = self._prove_invariant["sel_base"]
                else:
                    marker_path = sb.selector_paths[0]
                    const_dev = _setup_slice(
                        self.num_var, self.num_var + len(marker_path)) \
                        if marker_path else None
                    if const_dev is None and marker_path:
                        const_dev = device.to_device_cols(
                            sb.constant_columns[:len(marker_path)])
                    sel_base = gl.ones((n,)).astuple()
                    for k_, bit in enumerate(marker_path):
                        c_lo, c_hi = col(const_dev, k_)
                        if not bit:
                            c_lo, c_hi = jbase_one_minus(c_lo, c_hi)
                        sel_base = jbase_mul(sel_base[0], sel_base[1],
                                             c_lo, c_hi)
                    self._prove_invariant["sel_base"] = sel_base
            tbl_dev = _setup_slice(self.num_var + self.num_const,
                                   self.num_var + self.num_const
                                   + self.num_table)
            if tbl_dev is None:
                if "tbl_dev" not in self._prove_invariant:
                    self._prove_invariant["tbl_dev"] = \
                        device.to_device_cols(sb.lookup_tables_columns)
                tbl_dev = self._prove_invariant["tbl_dev"]
            if lp.id_in_constant:
                idxes = sb.table_ids_column_idxes
                tcol = self.num_var + idxes[0]
                tid_dev = _setup_slice(tcol, tcol + len(idxes))
                if tid_dev is None:
                    if "tid_dev" not in self._prove_invariant:
                        self._prove_invariant["tid_dev"] = \
                            device.to_device_cols(sb.constant_columns[
                                idxes[0]:idxes[0] + len(idxes)])
                    tid_dev = self._prove_invariant["tid_dev"]
            if wl is not None:
                moff = self.num_var + self.num_wit
                mult_dev = GL(wl.lo[:, moff:moff + 1],
                              wl.hi[:, moff:moff + 1])
            else:
                mult_dev = device.to_device_cols(mult_cols)

        if self.mesh is None:
            # fused single-dispatch stage 2+3 (bit-identical field math)
            nr_host = np.asarray(self.non_res, np.uint64)
            nrl = jnp.asarray((nr_host & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            nrh = jnp.asarray((nr_host >> np.uint64(32)).astype(np.uint32))
            zero_n = jnp.zeros((n,), jnp.uint32)
            gpow_arr = (gpow_arr_dev if use_dev_ts
                        else jnp.asarray(np.stack(gpow_a)))
            fused = _stage23_jit(
                n, self.num_var, qd, num_lookup_subargs, width, pw, base_off,
                bool(lp.id_in_constant) if lp.lookup_is_allowed else False,
                lp.lookup_is_allowed, sel_base is not None, self.num_table)
            s2_lo, s2_hi = fused(
                vars_dev.lo, vars_dev.hi, sig_dev.lo, sig_dev.hi,
                x_dev.lo, x_dev.hi, nrl, nrh,
                jnp.asarray(beta_a), jnp.asarray(gamma_a),
                jnp.asarray(lbeta_a), gpow_arr,
                tbl_dev.lo if tbl_dev is not None else jnp.zeros((n, 0), jnp.uint32),
                tbl_dev.hi if tbl_dev is not None else jnp.zeros((n, 0), jnp.uint32),
                tid_dev.lo if tid_dev is not None else zero_n[:, None],
                tid_dev.hi if tid_dev is not None else zero_n[:, None],
                sel_base[0] if sel_base is not None else zero_n,
                sel_base[1] if sel_base is not None else zero_n,
                mult_dev.lo[:, 0] if mult_dev is not None else zero_n,
                mult_dev.hi[:, 0] if mult_dev is not None else zero_n)
        else:
            chunks = []
            for c in range(self.num_intermediates + 1):
                num_acc = EV.const((1, 0), (n,))
                den_acc = EV.const((1, 0), (n,))
                for j in range(c * qd, min((c + 1) * qd, self.num_var)):
                    w_lo, w_hi = col(vars_dev, j)
                    nr = scalar_ext((self.non_res[j], 0))
                    bx_lo, bx_hi = jbase_mul(
                        x_dev.lo, x_dev.hi,
                        jnp.broadcast_to(jnp.uint32(nr[0, 0]), (n,)),
                        jnp.broadcast_to(jnp.uint32(nr[0, 1]), (n,)))
                    num_j = EV(*jaffine(w_lo, w_hi, bx_lo, bx_hi, beta_a, gamma_a))
                    s_lo, s_hi = col(sig_dev, j)
                    den_j = EV(*jaffine(w_lo, w_hi, s_lo, s_hi, beta_a, gamma_a))
                    num_acc = num_acc * num_j
                    den_acc = den_acc * den_j
                chunks.append(num_acc * den_acc.inv())

            total = chunks[0]
            for c in chunks[1:]:
                total = total * c
            from ..parallel.sharding import distributed_grand_product
            z_ev = EV(*distributed_grand_product(self.mesh, n)(*total.a))
            stage2_evs = [z_ev]
            prev = z_ev
            for c in chunks[:-1]:
                prev = prev * c
                stage2_evs.append(prev)

            if lp.lookup_is_allowed:
                from .jit_ops import jscale_base
                for rep in range(num_lookup_subargs):
                    agg = EV.const(lookup_beta, (n,))
                    for i in range(pw):
                        w_lo, w_hi = col(vars_dev, base_off + rep * pw + i)
                        agg = agg + EV(*jscale_base(w_lo, w_hi, gpow_a[i]))
                    if lp.id_in_constant:
                        ntid = tid_dev.lo.shape[1]
                        t_lo, t_hi = col(tid_dev, min(rep, ntid - 1))
                        agg = agg + EV(*jscale_base(t_lo, t_hi, gpow_a[width]))
                    a_ev = agg.inv()
                    if sel_base is not None:
                        a_ev = a_ev.mul_base(sel_base[0], sel_base[1])
                    stage2_evs.append(a_ev)
                agg_t = EV.const(lookup_beta, (n,))
                for i in range(self.num_table):
                    t_lo, t_hi = col(tbl_dev, i)
                    agg_t = agg_t + EV(*jscale_base(t_lo, t_hi, gpow_a[i]))
                m_lo, m_hi = col(mult_dev, 0)
                stage2_evs.append(agg_t.inv().mul_base(m_lo, m_hi))

            # stage-2 oracle: columns [p.c0, p.c1] per ext poly
            s2_lo = jnp.stack(
                [a for ev_ in stage2_evs for a in (ev_.a[0], ev_.a[2])], axis=1)
            s2_hi = jnp.stack(
                [a for ev_ in stage2_evs for a in (ev_.a[1], ev_.a[3])], axis=1)
        stage2_base = GL(s2_lo, s2_hi)
        _sync("s2 fused program", stage2_base.lo)
        if self.mesh is not None:
            from ..parallel.sharded_oracle import sharded_cols_to_monomials
            stage2_monos = sharded_cols_to_monomials(self.mesh, stage2_base)
        else:
            stage2_monos = device.cols_to_monomials(stage2_base)
        _sync("s2 monomials", stage2_monos.lo)
        stage2_oracle = self._make_oracle(None, used_lde, cap_size, hasher,
                                          tree_lde=fri_lde,
                                          monomials=stage2_monos)
        absorb_cap(stage2_oracle)

        _stage("stage2+3")
        # -- alphas -----------------------------------------------------------
        if not use_dev_ts:
            alpha = _s2(tuple(transcript.get_multiple_challenges(2)))
        total_lookup_terms = num_lookup_subargs + self.num_mult
        total_specialized_terms = sum(
            cs.evaluators_specialized[cs.specialized_idx_by_name[nm]]
            .num_quotient_terms * reps
            for (nm, _, reps) in cs.gate_spec_layout)
        total_general_terms = sum(
            ev.num_quotient_terms * ev.num_repetitions(geometry)
            for ev in cs.evaluators_general)
        total_terms = (total_lookup_terms + total_specialized_terms
                       + total_general_terms + 2 + self.num_intermediates)
        if use_dev_ts:
            alpha_table = ext_pow_table_dev(transcript.get_ext_challenge(),
                                            total_terms)
            alpha_arrs = [alpha_table[i] for i in range(total_terms)]

            def alpha_slice(start, count):
                return alpha_table[start:start + count]
        else:
            alpha_pows = [(1, 0)]
            for _ in range(total_terms - 1):
                alpha_pows.append(ext2.s2_mul(alpha_pows[-1], alpha))
            alpha_arrs = [scalar_ext(a) for a in alpha_pows]

            def alpha_slice(start, count):
                return jnp.asarray(np.stack(alpha_arrs[start:start + count]))
        del alpha_slice  # per-path helpers slice the tables directly

        # -- quotient over the (qd·n) flat LDE --------------------------------
        size = qd * n

        def flat_prefix(oracle):
            # avoid the eager slice dispatch when the prefix is the whole
            # array (~20-40 ms per eager op over the tunnel). Single-device
            # oracles store the flat TRANSPOSED (k, L*n).
            if self.mesh is None:
                f_ = oracle.flat_t
                return f_ if f_.shape[1] == size \
                    else GL(f_.lo[:, :size], f_.hi[:, :size])
            f_ = oracle.flat
            return f_ if f_.shape[0] == size else f_[:size]

        w_flat = flat_prefix(witness_oracle)
        s_flat = flat_prefix(setup_oracle)
        g2_flat = flat_prefix(stage2_oracle)
        if "x_lde" in self._prove_invariant:
            x_lde = self._prove_invariant["x_lde"]
        else:
            x_lde = gl.from_u64(device.x_poly_lde_host(n, qd).reshape(-1))
            self._prove_invariant["x_lde"] = x_lde

        # shared prove-invariant inputs (hoisted: both the mega-fused and
        # the rolled paths read them)
        if "l1" in self._prove_invariant:
            l1 = self._prove_invariant["l1"]
        else:
            l1 = gl.from_u64(
                device.unnormalized_l1_lde_host(n, qd).reshape(-1))
            self._prove_invariant["l1"] = l1
        if "vanish" in self._prove_invariant:
            vanish = self._prove_invariant["vanish"]
        else:
            vanish = gl.from_u64(
                np.repeat(device.vanishing_inverse_per_coset(n, qd), n))
            self._prove_invariant["vanish"] = vanish
        if "nr_limbs" in self._prove_invariant:
            nrl, nrh = self._prove_invariant["nr_limbs"]
        else:
            nr_host = np.asarray(self.non_res, np.uint64)
            nrl = jnp.asarray((nr_host & np.uint64(0xFFFFFFFF))
                              .astype(np.uint32))
            nrh = jnp.asarray((nr_host >> np.uint64(32)).astype(np.uint32))
            self._prove_invariant["nr_limbs"] = (nrl, nrh)

        # z shifted LDE from scaled monomials
        if "scale_pows" in self._prove_invariant:
            scale_pows = self._prove_invariant["scale_pows"]
        else:
            scale_pows = gl.from_u64(npgl.powers(omega, n))
            self._prove_invariant["scale_pows"] = scale_pows
        if self.mesh is not None:
            z_mono = GL(stage2_monos.lo[:, 0:2], stage2_monos.hi[:, 0:2])
            z_shift_mono = gl.mul(z_mono, GL(scale_pows.lo[:, None],
                                             scale_pows.hi[:, None]))
            from ..parallel.sharded_oracle import sharded_monomials_to_lde
            zs_lde = sharded_monomials_to_lde(
                self.mesh, z_shift_mono, qd).reshape(size, 2)
            z_shift = EV(zs_lde.lo[:, 0], zs_lde.hi[:, 0],
                         zs_lde.lo[:, 1], zs_lde.hi[:, 1])
        else:
            # one cached-jit dispatch for slice + scale + LDE + re-layout
            # (the eager chain here cost tens of ~20-40 ms tunnel dispatches)
            o_ = _z_shift_lde_jit(n, qd)(
                stage2_monos.lo, stage2_monos.hi,
                scale_pows.lo, scale_pows.hi)
            z_shift = EV(*o_)

        import os as _os
        import jax as _jax
        # mega cap: circuits with very wide gate rosters (the recursion
        # outer's flattened Poseidon gates are 118+ terms each) produce a
        # merged graph the TPU compile server OOMs on — those keep the
        # per-phase fused programs (round-3 behavior, 2.1 s warm)
        mega_cap = int(_os.environ.get("BOOJUM_MEGA_MAX_TERMS", "96"))
        use_mega = (self.fuse and self.mesh is None
                    and total_terms <= mega_cap
                    and (_jax.default_backend() != "cpu"
                         or _os.environ.get("BOOJUM_FORCE_MEGA")))
        if use_mega:
            # the ENTIRE quotient stage as ONE program (accelerator only:
            # XLA:CPU's compile of the merged graph is pathological — the
            # CPU fused path keeps the per-phase programs below)
            _stage("  q prep")
            qf, qf_terms = self._quotient_full_fn()
            assert qf_terms == total_terms
            if use_dev_ts:
                alphas_all = alpha_table
                gpow_all = gpow_arr_dev
            else:
                alphas_all = jnp.asarray(np.stack(alpha_arrs))
                gpow_all = jnp.asarray(np.stack(gpow_a))
            out_lo, out_hi = qf(
                w_flat.lo, w_flat.hi, s_flat.lo, s_flat.hi,
                g2_flat.lo, g2_flat.hi, x_lde.lo, x_lde.hi, nrl, nrh,
                z_shift.a[0], z_shift.a[1], z_shift.a[2], z_shift.a[3],
                l1.lo, l1.hi, vanish.lo, vanish.hi,
                jnp.asarray(beta_a), jnp.asarray(gamma_a),
                jnp.asarray(lbeta_a), gpow_all, alphas_all)
            _stage("  q mega dispatched")
            if verbose:
                _sync("q mega drained", out_lo)
            q_monos = GL(out_lo, out_hi)
            if cs.config.runtime_asserts:
                top0 = int(np.asarray(q_monos.lo[-1, 2 * qd - 2])) | \
                    (int(np.asarray(q_monos.hi[-1, 2 * qd - 2])) << 32)
                top1 = int(np.asarray(q_monos.lo[-1, 2 * qd - 1])) | \
                    (int(np.asarray(q_monos.hi[-1, 2 * qd - 1])) << 32)
                if top0 != 0 or top1 != 0:
                    # DEBUG_SATISFIABLE analogue (reference src/config.rs:7)
                    cs.check_if_satisfied(verbose=True)
                    raise AssertionError(
                        "unsatisfied circuit (see row report above)")
        else:
            # per-phase fused / rolled / mesh path
            assert not use_dev_ts or self.fuse
            q_monos = self._quotient_rolled(
                w_flat, s_flat, g2_flat, x_lde, l1, vanish, z_shift,
                size, total_terms, num_lookup_subargs, width, pw, base_off,
                alpha_arrs,
                gpow_a if not use_dev_ts else None,
                beta_a, gamma_a,
                lookup_beta if not use_dev_ts else (0, 0),
                use_dev_ts=use_dev_ts,
                alpha_table=alpha_table if use_dev_ts else None,
                lbeta_a=lbeta_a,
                gpow_arr_dev=gpow_arr_dev if use_dev_ts else None)

        quotient_oracle = self._make_oracle(None, fri_lde, cap_size, hasher,
                                            monomials=q_monos)
        _stage("  q oracle dispatched")
        if verbose and hasattr(quotient_oracle.tree, "layers"):
            _sync("q device drained", quotient_oracle.tree.layers[-1][0])
        absorb_cap(quotient_oracle)

        _stage("quotient")
        # -- evaluations at z -------------------------------------------------
        nv, nw, nm, nc, nt = (self.num_var, self.num_wit, self.num_mult,
                              self.num_const, self.num_table)
        s2m = stage2_oracle.monomials
        vz_dev = vzw_dev = v0_dev = None
        if use_dev_ts:
            z_arr = transcript.get_ext_challenge()
            ni = self.num_intermediates
            n_at0 = (num_lookup_subargs + 1) if lp.lookup_is_allowed else 0
            # public-opening tables (host, static per witness)
            pub_tuples_d = {}
            for (c_, r_, value) in publics:
                open_at = pow(omega, r_, P)
                pub_tuples_d.setdefault(open_at, []).append((c_, value))
            pub_vals_list = [(v, 0) for subset in pub_tuples_d.values()
                             for (_, v) in subset]
            pub_vals_np = (np.stack([scalar_ext(v) for v in pub_vals_list])
                           if pub_vals_list
                           else np.zeros((0, 2, 2), np.uint32))
            pub_pts_np = (np.stack([scalar_ext((p, 0))
                                    for p in pub_tuples_d])
                          if pub_tuples_d
                          else np.zeros((0, 2, 2), np.uint32))
            sets = [witness_oracle.monomials, setup_oracle.monomials, s2m,
                    quotient_oracle.monomials,
                    GL(s2m.lo[:, :2], s2m.hi[:, :2])]
            widths = tuple(m_.shape[1] for m_ in sets)
            args = []
            for m_ in sets:
                args.extend((m_.lo, m_.hi))
            out = _evals_deep_prep_jit(
                n, widths, omega, nv, nw, nm, nc, nt, ni,
                num_lookup_subargs, qd, lp.lookup_is_allowed,
                len(pub_vals_list), len(pub_tuples_d))(
                    z_arr, pub_vals_np, pub_pts_np, *args)
            if verbose:
                _sync("evals drained", out[0])
            vz_dev = (GL(out[0], out[1]), GL(out[2], out[3]))
            vzw_dev = (GL(out[4], out[5]), GL(out[6], out[7]))
            k_ = 8
            if lp.lookup_is_allowed:
                v0_dev = (GL(out[8], out[9]), GL(out[10], out[11]))
                k_ = 12
            val_flat_dev = out[k_]
            pts_arr_dev = out[k_ + 1]
            # absorb streams (same order as the host path)
            transcript.absorb_interleaved_dev(
                vz_dev[0].lo, vz_dev[0].hi, vz_dev[1].lo, vz_dev[1].hi)
            transcript.absorb_interleaved_dev(
                vzw_dev[0].lo, vzw_dev[0].hi, vzw_dev[1].lo, vzw_dev[1].hi)
            if v0_dev is not None:
                transcript.absorb_interleaved_dev(
                    v0_dev[0].lo, v0_dev[0].hi, v0_dev[1].lo, v0_dev[1].hi)
            # placeholder host lists (sizes only); real values fetched in the
            # final batched proof fetch
            total_z = int(vz_dev[0].shape[0])
            values_at_z = [None] * total_z
            values_at_z_omega = [None]
            values_at_0 = [None] * n_at0
        else:
            z_pt = _s2(tuple(transcript.get_multiple_challenges(2)))
            zw = ext2.s2_mul(z_pt, (omega, 0))
            s2_row0_host = None
            if self.mesh is None:
                from .oracles import eval_monomial_sets_at
                extra = ((s2m.lo[0], s2m.hi[0])
                         if lp.lookup_is_allowed else ())
                (ev_w, ev_s, ev_2, ev_q, ev_zw), extra_host = \
                    eval_monomial_sets_at([
                        (witness_oracle.monomials, z_pt),
                        (setup_oracle.monomials, z_pt),
                        (s2m, z_pt),
                        (quotient_oracle.monomials, z_pt),
                        (GL(s2m.lo[:, :2], s2m.hi[:, :2]), zw),
                    ], extra_fetch=extra)
                if lp.lookup_is_allowed:
                    s2_row0_host = (extra_host[0].astype(np.uint64) |
                                    (extra_host[1].astype(np.uint64)
                                     << np.uint64(32)))
            else:
                z_pows = npgl.ext_powers(z_pt, n)
                zw_pows = npgl.ext_powers(zw, n)
                ev_w = witness_oracle.eval_monomials_at(z_pows)
                ev_s = setup_oracle.eval_monomials_at(z_pows)
                ev_2 = stage2_oracle.eval_monomials_at(z_pows)
                ev_q = quotient_oracle.eval_monomials_at(z_pows)
                ev_zw = stage2_oracle.eval_monomials_at(zw_pows)[:2]

            def pair(evals, i):
                f0, f1 = evals[2 * i], evals[2 * i + 1]
                return ((f0[0] + 7 * f1[1]) % P, (f0[1] + f1[0]) % P)

            values_at_z = []
            values_at_z.extend(ev_w[:nv + nw])
            values_at_z.extend(ev_s[nv:nv + nc])
            values_at_z.extend(ev_s[:nv])
            values_at_z.append(pair(ev_2, 0))
            for i in range(self.num_intermediates):
                values_at_z.append(pair(ev_2, 1 + i))
            if lp.lookup_is_allowed:
                values_at_z.extend(ev_w[nv + nw:nv + nw + nm])
                a_base = 1 + self.num_intermediates
                for i in range(num_lookup_subargs):
                    values_at_z.append(pair(ev_2, a_base + i))
                values_at_z.append(pair(ev_2, a_base + num_lookup_subargs))
                values_at_z.extend(ev_s[nv + nc:nv + nc + nt])
            for k in range(qd):
                values_at_z.append(pair(ev_q, k))
            for v in values_at_z:
                transcript.witness_field_elements([v[0], v[1]])

            values_at_z_omega = [pair(ev_zw, 0)]
            transcript.witness_field_elements([values_at_z_omega[0][0],
                                               values_at_z_omega[0][1]])

            values_at_0 = []
            if lp.lookup_is_allowed:
                if s2_row0_host is not None:
                    row0 = s2_row0_host  # rode the evals-at-z device_get
                else:
                    row0 = (np.asarray(stage2_oracle.monomials.lo[0],
                                       np.uint64) |
                            (np.asarray(stage2_oracle.monomials.hi[0],
                                        np.uint64) << np.uint64(32)))
                a_off = 2 * (1 + self.num_intermediates)
                for i in range(num_lookup_subargs):
                    values_at_0.append((int(row0[a_off + 2 * i]),
                                        int(row0[a_off + 2 * i + 1])))
                b_off = a_off + 2 * num_lookup_subargs
                values_at_0.append((int(row0[b_off]), int(row0[b_off + 1])))
                for v in values_at_0:
                    transcript.witness_field_elements([v[0], v[1]])

        _stage("evals at z")
        # -- DEEP --------------------------------------------------------------
        if use_dev_ts:
            deep_arr = transcript.get_ext_challenge()
        else:
            deep = _s2(tuple(transcript.get_multiple_challenges(2)))
        pub_tuples = {}
        for (c_, r_, value) in publics:
            open_at = pow(omega, r_, P)
            pub_tuples.setdefault(open_at, []).append((c_, value))
        total_ch = len(values_at_z) + 1 + len(values_at_0) + \
            sum(len(s) for s in pub_tuples.values())
        if not use_dev_ts:
            deep_pows = [(1, 0)]
            for _ in range(total_ch - 1):
                deep_pows.append(ext2.s2_mul(deep_pows[-1], deep))

        fsize = fri_lde * n
        if "x_fri" in self._prove_invariant:
            x_fri = self._prove_invariant["x_fri"]
        else:
            x_fri = gl.from_u64(device.x_poly_lde_host(n, fri_lde)
                                .reshape(-1))
            self._prove_invariant["x_fri"] = x_fri

        # Build the opening plan: one group per opening point; each source is
        # (oracle_id, c0, c1) with c1 == -1 marking a base-field column.
        W_, S_, T2_, Q_ = 0, 1, 2, 3
        sources_z = []
        for i in range(nv + nw):
            sources_z.append((W_, i, -1))
        for i in range(nc):
            sources_z.append((S_, nv + i, -1))
        for i in range(nv):
            sources_z.append((S_, i, -1))
        sources_z.append((T2_, 0, 1))
        for i in range(self.num_intermediates):
            sources_z.append((T2_, 2 + 2 * i, 3 + 2 * i))
        if lp.lookup_is_allowed:
            for i in range(nm):
                sources_z.append((W_, nv + nw + i, -1))
            a_off = 2 * (1 + self.num_intermediates)
            for i in range(num_lookup_subargs):
                sources_z.append((T2_, a_off + 2 * i, a_off + 2 * i + 1))
            b_off = a_off + 2 * num_lookup_subargs
            sources_z.append((T2_, b_off, b_off + 1))
            for i in range(nt):
                sources_z.append((S_, nv + nc + i, -1))
        for k in range(qd):
            sources_z.append((Q_, 2 * k, 2 * k + 1))
        assert len(sources_z) == len(values_at_z)
        z_pt_g = None if use_dev_ts else z_pt
        zw_g = None if use_dev_ts else zw
        groups = [(sources_z, values_at_z, z_pt_g),
                  ([(T2_, 0, 1)], values_at_z_omega, zw_g)]
        if lp.lookup_is_allowed:
            srcs0 = []
            a_off = 2 * (1 + self.num_intermediates)
            for i in range(num_lookup_subargs):
                srcs0.append((T2_, a_off + 2 * i, a_off + 2 * i + 1))
            b_off = a_off + 2 * num_lookup_subargs
            srcs0.append((T2_, b_off, b_off + 1))
            groups.append((srcs0, values_at_0, (0, 0)))
        for open_at, subset in pub_tuples.items():
            groups.append(([(W_, c_, -1) for (c_, _) in subset],
                           [(value, 0) for (_, value) in subset],
                           (open_at, 0)))

        if use_dev_ts:
            lam_flat = ext_pow_table_dev(deep_arr, total_ch)
            val_flat = val_flat_dev
            pts_arr = pts_arr_dev
            assert int(val_flat.shape[0]) == total_ch
        else:
            lam_flat = np.stack([scalar_ext(c) for c in deep_pows])
            val_flat = np.stack([scalar_ext(tuple(v))
                                 for (_, vals_, _) in groups for v in vals_])
            pts_arr = np.stack([scalar_ext(p) for (_, _, p) in groups])
            assert len(val_flat) == total_ch

        def flat_fri(oracle):
            if self.mesh is None:
                f_ = oracle.flat_t
                return f_ if f_.shape[1] == fsize \
                    else GL(f_.lo[:, :fsize], f_.hi[:, :fsize])
            f_ = oracle.flat
            return f_ if f_.shape[0] == fsize else f_[:fsize]

        wf = flat_fri(witness_oracle)
        sf = flat_fri(setup_oracle)
        tf = flat_fri(stage2_oracle)
        qf = flat_fri(quotient_oracle)
        if self.fuse:
            layout = tuple(tuple(srcs_) for (srcs_, _, _) in groups)
            out = _deep_jit(fsize, layout, self.mesh is None)(
                wf.lo, wf.hi, sf.lo, sf.hi, tf.lo, tf.hi, qf.lo, qf.hi,
                x_fri.lo, x_fri.hi, jnp.asarray(pts_arr),
                jnp.asarray(lam_flat), jnp.asarray(val_flat))
            h = EV(*out)
        else:
            mats = (wf, sf, tf, qf)
            li = 0
            tr_ = self.mesh is None  # transposed flats on single-device

            def _src_col(fm, c):
                if tr_:
                    return fm.lo[c], fm.hi[c]
                return fm.lo[:, c], fm.hi[:, c]

            h = EV.const((0, 0), (fsize,))
            for (srcs_, vals_, point) in groups:
                acc_l = EV.const((0, 0), (fsize,))
                for (oid, c0_, c1_), v_ in zip(srcs_, vals_):
                    fm = mats[oid]
                    if c1_ < 0:
                        z_ = jnp.zeros((fsize,), jnp.uint32)
                        s_ = EV(*_src_col(fm, c0_), z_, z_)
                    else:
                        s_ = EV(*_src_col(fm, c0_), *_src_col(fm, c1_))
                    diff = s_ - EV.const(tuple(v_), (fsize,))
                    acc_l = acc_l + diff.scale(lam_flat[li])
                    li += 1
                den = EV.from_base(x_fri.lo, x_fri.hi) - \
                    EV.const(point, (fsize,))
                h = h + acc_l * den.inv()

        if verbose:
            _sync("DEEP drained", h.a[0])
        _stage("DEEP")
        # -- FRI + PoW + queries ----------------------------------------------
        new_pow_bits, num_queries, schedule, _fd = compute_fri_schedule(
            cfg.security_level, cap_size, cfg.pow_bits,
            fri_lde.bit_length() - 1, n.bit_length() - 1)
        if hasher == "poseidon2" or (self.mesh is None and
                                     hasher in ("blake2s", "keccak256")):
            from .device_merkle import do_fri_device
            fri_result = do_fri_device(h.a, transcript, schedule,
                                       fri_lde, cap_size, hasher,
                                       mesh=self.mesh, fuse=self.fuse,
                                       verbose=verbose)
        else:
            h_host = h.to_host()
            fri_result = do_fri(h_host[0], h_host[1], transcript, schedule,
                                fri_lde, cap_size, hasher)

        if verbose and getattr(fri_result, "monomial_forms_dev", None):
            # drain async FRI compute so it attributes HERE, not to the
            # query-phase sync (round-3/4 splits lumped them together)
            import jax as _jax_sync
            _jax_sync.block_until_ready(fri_result.monomial_forms_dev[0])
        _stage("FRI folds+trees")
        if use_dev_ts:
            # ONE sync: the sponge state + pending buffer cross to host and
            # the exact host transcript continues (PoW grinding + query-index
            # bit derivation are inherently host-side)
            transcript = transcript.handoff_to_host()
        pow_challenge = 0
        if new_pow_bits > 0:
            challenges = transcript.get_multiple_challenges(4)
            grind = {"keccak256": pow_mod.keccak256_pow,
                     "poseidon2": pow_mod.poseidon2_pow,
                     }.get(self.cfg.pow_hash, pow_mod.blake2s_pow)
            pow_challenge = grind(challenges, new_pow_bits)
            transcript.witness_field_elements(
                [pow_challenge & 0xFFFFFFFF, pow_challenge >> 32])

        max_needed_bits = (n * fri_lde).bit_length() - 1
        num_coset_bits = fri_lde.bit_length() - 1
        num_inner_bits = max_needed_bits - num_coset_bits
        bools = _BoolsBuffer(max_needed_bits)
        positions = []
        for _ in range(num_queries):
            bits = bools.get_bits(transcript, max_needed_bits)
            positions.append((_u64_from_lsb(bits[num_inner_bits:]),
                              _u64_from_lsb(bits[:num_inner_bits])))
        flat_idx = [c_ * n + i_ for (c_, i_) in positions]
        # every query-phase device->host transfer (leaf rows, Merkle paths,
        # FRI chunks) rides ONE batched device_get — each get is a full
        # tunnel round-trip, and the per-oracle version cost ~2 s/prove
        from .device_merkle import FetchCollector
        coll = FetchCollector()
        w_rows = witness_oracle.query_many(flat_idx, collector=coll)
        s2_rows = stage2_oracle.query_many(flat_idx, collector=coll)
        q_rows = quotient_oracle.query_many(flat_idx, collector=coll)
        su_rows = setup_oracle.query_many(flat_idx, collector=coll)
        # batch-prefetch every Merkle path + FRI leaf chunk (device trees)
        for oracle in (witness_oracle, stage2_oracle, quotient_oracle,
                       setup_oracle):
            if hasattr(oracle.tree, "prefetch_proofs"):
                oracle.tree.prefetch_proofs(flat_idx, collector=coll)
        fri_oracles = [fri_result.base_oracle] + \
            list(fri_result.intermediate_oracles)
        cur_domain_pf = n
        fri_idx_per_oracle = [[] for _ in fri_oracles]
        for (coset_idx, inner_idx) in positions:
            dom, inner = cur_domain_pf, inner_idx
            for oi, k in enumerate(schedule):
                fri_idx_per_oracle[oi].append(coset_idx * dom + inner)
                inner >>= k
                dom >>= k
        for oracle, idxs in zip(fri_oracles, fri_idx_per_oracle):
            if hasattr(oracle, "prefetch"):
                oracle.prefetch(idxs, collector=coll)
        holders = {}
        if use_dev_ts:
            # final proof values ride the same single device_get: evals at
            # z/z·ω/0, FRI final monomials, and every oracle cap
            def reg(name, c0, c1):
                coll.add((c0.lo, c0.hi, c1.lo, c1.hi),
                         lambda h, name=name: holders.__setitem__(name, h))

            reg("vz", *vz_dev)
            reg("vzw", *vzw_dev)
            if v0_dev is not None:
                reg("v0", *v0_dev)
            m0l, m0h, m1l, m1h, final_degree = fri_result.monomial_forms_dev
            coll.add((m0l, m0h, m1l, m1h),
                     lambda h: holders.__setitem__("fri_monos", h))
            for oracle in (witness_oracle, stage2_oracle, quotient_oracle,
                           setup_oracle, *fri_oracles):
                tree = getattr(oracle, "tree", None)
                if tree is not None and hasattr(tree, "prefetch_cap"):
                    tree.prefetch_cap(coll)
        coll.flush()
        if use_dev_ts:
            def to_pairs(h):
                c0 = (np.asarray(h[0], np.uint64)
                      | (np.asarray(h[1], np.uint64) << np.uint64(32)))
                c1 = (np.asarray(h[2], np.uint64)
                      | (np.asarray(h[3], np.uint64) << np.uint64(32)))
                return [(int(a), int(b)) for a, b in zip(c0, c1)]

            values_at_z = to_pairs(holders["vz"])
            values_at_z_omega = to_pairs(holders["vzw"])
            values_at_0 = to_pairs(holders["v0"]) if "v0" in holders else []
            fm = to_pairs(holders["fri_monos"])
            m0 = [a for (a, _) in fm]
            m1 = [b for (_, b) in fm]
            assert not any(m0[final_degree:]) and not any(m1[final_degree:]), \
                "FRI final poly degree too high"
            fri_result.monomial_forms = (m0[:final_degree],
                                         m1[:final_degree])
        w_rows, s2_rows, q_rows, su_rows = (
            r.value if hasattr(r, "value") else r
            for r in (w_rows, s2_rows, q_rows, su_rows))

        _stage("query prefetch")
        rounds = []
        for qi, (coset_idx, inner_idx) in enumerate(positions):
            rounds.append(SingleRoundQueries(
                witness_oracle.query(coset_idx, inner_idx, w_rows, qi),
                stage2_oracle.query(coset_idx, inner_idx, s2_rows, qi),
                quotient_oracle.query(coset_idx, inner_idx, q_rows, qi),
                setup_oracle.query(coset_idx, inner_idx, su_rows, qi),
                _fri_queries(fri_result, schedule, n, coset_idx, inner_idx)))

        _stage("query assembly")
        return Proof(
            proof_config=cfg,
            public_inputs=public_values,
            witness_oracle_cap=witness_oracle.get_cap(),
            stage_2_oracle_cap=stage2_oracle.get_cap(),
            quotient_oracle_cap=quotient_oracle.get_cap(),
            final_fri_monomials=fri_result.monomial_forms,
            values_at_z=values_at_z,
            values_at_z_omega=values_at_z_omega,
            values_at_0=values_at_0,
            fri_base_oracle_cap=fri_result.base_oracle.get_cap(),
            fri_intermediate_oracles_caps=[
                o.get_cap() for o in fri_result.intermediate_oracles],
            queries_per_fri_repetition=rounds,
            pow_challenge=pow_challenge,
        )


def _fri_queries(fri_result, schedule, n, coset_idx, inner_idx):
    out = []
    cur_domain = n
    cur_inner = inner_idx
    for idx, k in enumerate(schedule):
        fidx = coset_idx * cur_domain + cur_inner
        if idx == 0:
            out.append(fri_result.base_oracle.query(fidx))
        else:
            out.append(fri_result.intermediate_oracles[idx - 1].query(fidx))
        cur_inner >>= k
        cur_domain >>= k
    return out


@functools.lru_cache(maxsize=None)
def _evals_deep_prep_jit(n, widths, omega, nv, nw, nm, nc, nt, ni, nsub, qd,
                         lookup, n_pub, n_pub_pts):
    """ONE program for the whole evals-at-z + DEEP-prep stage under the
    device transcript: z·ω, on-device power tables, all barycentric sums,
    ext-pair recombination in the proof's value order, the absorb streams,
    and the DEEP val/point tables. (Eager jnp ops cost ~20-40 ms each over
    the tunnel — this used to be ~40 of them.)"""
    import jax
    import jax.numpy as jnp

    from ..field.extension import GL2

    def f(z_arr, pub_vals, pub_pts, *mono_args):
        om = np.zeros((2, 2), np.uint32)
        om[0] = (omega & 0xFFFFFFFF, omega >> 32)
        zw_arr = _ext_mul_22(z_arr, jnp.asarray(om))
        # power tables for z and z·ω (associative scans, as in oracles.py)
        pows = []
        for pt in (z_arr, zw_arr):
            base = GL2(gl.GL(jnp.broadcast_to(pt[0, 0], (n,)),
                             jnp.broadcast_to(pt[0, 1], (n,))),
                       gl.GL(jnp.broadcast_to(pt[1, 0], (n,)),
                             jnp.broadcast_to(pt[1, 1], (n,))))
            seeded = GL2(
                gl.GL(base.c0.lo.at[0].set(1), base.c0.hi.at[0].set(0)),
                gl.GL(base.c1.lo.at[0].set(0), base.c1.hi.at[0].set(0)))
            pows.append(jax.lax.associative_scan(ext2.mul, seeded, axis=0))
        point_ids = (0, 0, 0, 0, 1)
        setv = []
        for si in range(len(widths)):
            mono = GL(mono_args[2 * si], mono_args[2 * si + 1])
            zp = pows[point_ids[si]]
            comps = []
            for comp in (zp.c0, zp.c1):
                prod = gl.mul(mono, GL(comp.lo[:, None], comp.hi[:, None]))
                comps.append(device._sum_gl(prod, axis=0))
            setv.append((comps[0], comps[1]))  # (A, B) = (c0, c1) per poly

        def pairs(si, start, count):
            A, B = setv[si]
            a0 = A[2 * start:2 * (start + count):2]
            b0 = B[2 * start:2 * (start + count):2]
            a1 = A[2 * start + 1:2 * (start + count):2]
            b1 = B[2 * start + 1:2 * (start + count):2]
            return (gl.add(a0, gl.mul_by_u32(b1, 7)), gl.add(b0, a1))

        Aw, Bw = setv[0]
        As, Bs = setv[1]
        parts = [(Aw[:nv + nw], Bw[:nv + nw]),
                 (As[nv:nv + nc], Bs[nv:nv + nc]),
                 (As[:nv], Bs[:nv]),
                 pairs(2, 0, 1 + ni)]
        if lookup:
            parts.append((Aw[nv + nw:nv + nw + nm], Bw[nv + nw:nv + nw + nm]))
            parts.append(pairs(2, 1 + ni, nsub + 1))
            parts.append((As[nv + nc:nv + nc + nt], Bs[nv + nc:nv + nc + nt]))
        parts.append(pairs(3, 0, qd))
        vz_c0 = gl.concat([c0 for (c0, _) in parts])
        vz_c1 = gl.concat([c1 for (_, c1) in parts])
        zw_c0, zw_c1 = pairs(4, 0, 1)
        outs = [vz_c0.lo, vz_c0.hi, vz_c1.lo, vz_c1.hi,
                zw_c0.lo, zw_c0.hi, zw_c1.lo, zw_c1.hi]

        def v22(c0, c1):
            return jnp.stack([jnp.stack([c0.lo, c0.hi], axis=-1),
                              jnp.stack([c1.lo, c1.hi], axis=-1)], axis=1)

        val_parts = [v22(vz_c0, vz_c1), v22(zw_c0, zw_c1)]
        pt_parts = [z_arr[None], zw_arr[None]]
        if lookup:
            # values at 0 = row 0 of the s2 A/B monomials
            a_off = 2 * (1 + ni)
            s2lo, s2hi = mono_args[4], mono_args[5]
            row = GL(s2lo[0, a_off:a_off + 2 * (nsub + 1)],
                     s2hi[0, a_off:a_off + 2 * (nsub + 1)])
            v0_c0, v0_c1 = row[0::2], row[1::2]
            outs.extend((v0_c0.lo, v0_c0.hi, v0_c1.lo, v0_c1.hi))
            val_parts.append(v22(v0_c0, v0_c1))
            pt_parts.append(jnp.zeros((1, 2, 2), jnp.uint32))
        if n_pub:
            val_parts.append(pub_vals)
        if n_pub_pts:
            pt_parts.append(pub_pts)
        outs.append(jnp.concatenate(val_parts, axis=0))
        outs.append(jnp.concatenate(pt_parts, axis=0))
        return tuple(outs)

    return jax.jit(f)


def _ext_mul_22(a, b):
    """Traced (2,2)x(2,2) ext mul."""
    from ..field.extension import GL2
    x = GL2(GL(a[0, 0], a[0, 1]), GL(a[1, 0], a[1, 1]))
    y = GL2(GL(b[0, 0], b[0, 1]), GL(b[1, 0], b[1, 1]))
    o = ext2.mul(x, y)
    import jax.numpy as jnp_
    return jnp_.stack([jnp_.stack([o.c0.lo, o.c0.hi]),
                       jnp_.stack([o.c1.lo, o.c1.hi])])


def _consts_read(ev):
    """Constants the evaluator actually reads (>= num_constants for gates
    with row-shared constants)."""
    return ev.num_constants


def _gate_sweep_body(ev, reps, base_var, base_wit, base_const,
                     spec_base=None, trans=False):
    """Traced body: all repetitions of one gate, alpha-scaled and summed,
    times the selector column. Wrapped by _gate_sweep_fn; inlined into
    _quotient_full."""
    import jax.numpy as jnp_
    dv, dw, dc = ev.per_chunk_offset
    nv_, nw_ = ev.num_variables, ev.num_witnesses
    nc_ = max(ev.num_constants, _consts_read(ev))
    T = ev.num_quotient_terms
    if spec_base is not None:
        var_idx = np.asarray([[spec_base + r * nv_ + i
                               for r in range(reps)] for i in range(nv_)])
    else:
        var_idx = np.asarray([[base_var + r * dv + i
                               for r in range(reps)] for i in range(nv_)])
    wit_idx = np.asarray([[base_wit + r * dw + i for r in range(reps)]
                          for i in range(nw_)])
    const_idx = np.asarray([[base_const + r * dc + i
                             for r in range(reps)] for i in range(nc_)])

    def fn(w_lo, w_hi, s_lo, s_hi, sel_lo, sel_hi, alphas):
        if trans:
            # oracle flats arrive (k, size); XLA folds the transpose into
            # the column gathers below (contiguous row reads)
            w_lo, w_hi, s_lo, s_hi = w_lo.T, w_hi.T, s_lo.T, s_hi.T
        vars_ = [GL(w_lo[:, var_idx[i]], w_hi[:, var_idx[i]])
                 for i in range(nv_)]
        wits = [GL(w_lo[:, wit_idx[i]], w_hi[:, wit_idx[i]])
                for i in range(nw_)]
        consts = [GL(s_lo[:, const_idx[i]], s_hi[:, const_idx[i]])
                  for i in range(nc_)]
        src = TraceView(vars_, wits, consts)
        terms = ev.evaluate(src, GLOps)
        size = w_lo.shape[0]  # post-transpose: rows are the LDE domain
        acc0 = gl.zeros((size, reps))
        acc1 = gl.zeros((size, reps))
        # alpha for (rep r, term t) = alphas[r*T + t] (rep-major order)
        al = alphas.reshape(reps, T, 2, 2)
        for t, term in enumerate(terms):
            term = GL(jnp_.broadcast_to(term.lo, (size, reps)),
                      jnp_.broadcast_to(term.hi, (size, reps)))
            a0 = GL(jnp_.broadcast_to(al[None, :, t, 0, 0], (size, reps)),
                    jnp_.broadcast_to(al[None, :, t, 0, 1], (size, reps)))
            a1 = GL(jnp_.broadcast_to(al[None, :, t, 1, 0], (size, reps)),
                    jnp_.broadcast_to(al[None, :, t, 1, 1], (size, reps)))
            acc0 = gl.add(acc0, gl.mul(term, a0))
            acc1 = gl.add(acc1, gl.mul(term, a1))
        s0 = device._sum_gl(acc0, axis=1)
        s1 = device._sum_gl(acc1, axis=1)
        sel = GL(sel_lo, sel_hi)
        s0 = gl.mul(s0, sel)
        s1 = gl.mul(s1, sel)
        return s0.lo, s0.hi, s1.lo, s1.hi

    return fn


def _ext_prod_last(x):
    """GL2 product along the trailing axis (log-tree, exact field math)."""
    from ..field.extension import GL2
    m = x.c0.lo.shape[-1]
    while m > 1:
        half = m // 2
        a = x[..., :half]
        b = x[..., half:2 * half]
        s = ext2.mul(a, b)
        if m % 2:
            rem = x[..., 2 * half:m]
            s = GL2(GL(jnp_concat(s.c0.lo, rem.c0.lo), jnp_concat(s.c0.hi, rem.c0.hi)),
                    GL(jnp_concat(s.c1.lo, rem.c1.lo), jnp_concat(s.c1.hi, rem.c1.hi)))
            m = half + 1
        else:
            m = half
        x = s
    return x[..., 0]


def jnp_concat(a, b):
    import jax.numpy as jnp
    return jnp.concatenate([a, b], axis=-1)


@functools.lru_cache(maxsize=None)
def _stage23_jit(n, num_var, qd, num_subargs, width, pw, base_off,
                 id_in_constant, has_lookup, has_sel, num_table):
    """ONE compiled program for stages 2+3: per-chunk copy-permutation
    rational products, exclusive grand product z, intermediate partials,
    and the lookup A/B polys — replacing the per-column dispatch loop
    (~5 dispatches x num_var columns) whose launch overhead dominated the
    stage over the device tunnel. Exact field math: values are bit-identical
    to the unfused path."""
    import jax
    from ..field.extension import GL2

    G = -(-num_var // qd)

    import jax.numpy as jnp

    def f(vl, vh, sgl, sgh, xl, xh, nrl, nrh, beta, gamma, lbeta, gpow,
          tbl_l, tbl_h, tid_l, tid_h, sel_l, sel_h, ml, mh):
        w = GL(vl, vh)          # (n, nv)
        sg = GL(sgl, sgh)       # (n, nv)
        x = GL(xl, xh)          # (n,)
        nrx = gl.mul(GL(xl[:, None], xh[:, None]), GL(nrl[None, :], nrh[None, :]))

        def affine(base_arr, other):
            # w + β·other + γ  (ext), elementwise over (n, nv)
            b0 = GL(jnp.broadcast_to(beta[0, 0], other.lo.shape),
                    jnp.broadcast_to(beta[0, 1], other.lo.shape))
            b1 = GL(jnp.broadcast_to(beta[1, 0], other.lo.shape),
                    jnp.broadcast_to(beta[1, 1], other.lo.shape))
            g0 = GL(jnp.broadcast_to(gamma[0, 0], other.lo.shape),
                    jnp.broadcast_to(gamma[0, 1], other.lo.shape))
            g1 = GL(jnp.broadcast_to(gamma[1, 0], other.lo.shape),
                    jnp.broadcast_to(gamma[1, 1], other.lo.shape))
            c0 = gl.add(gl.add(base_arr, gl.mul(other, b0)), g0)
            c1 = gl.add(gl.mul(other, b1), g1)
            return GL2(c0, c1)

        num = affine(w, nrx)
        den = affine(w, sg)

        pad = G * qd - num_var
        if pad:
            def padded(e):
                one_lo = jnp.ones((n, pad), jnp.uint32)
                zero = jnp.zeros((n, pad), jnp.uint32)
                return GL2(GL(jnp_concat(e.c0.lo, one_lo),
                              jnp_concat(e.c0.hi, zero)),
                           GL(jnp_concat(e.c1.lo, zero),
                              jnp_concat(e.c1.hi, zero)))
            num = padded(num)
            den = padded(den)
        num = num.reshape(n, G, qd)
        den = den.reshape(n, G, qd)
        chunk_num = _ext_prod_last(num)     # (n, G)
        chunk_den = _ext_prod_last(den)
        chunk_den_inv = device.ext_inverse(chunk_den)
        ratios = ext2.mul(chunk_num, chunk_den_inv)   # (n, G)
        total = _ext_prod_last(ratios)                # (n,)
        z = device.grand_product_exclusive(total)     # (n,)
        # partials: z · cumprod(ratios[:, :i+1]) for i in 0..G-2
        incl = jax.lax.associative_scan(ext2.mul, ratios, axis=1)
        cols = [z]
        for i in range(G - 1):
            cols.append(ext2.mul(z, incl[:, i]))

        if has_lookup:
            def gp(i):  # gamma^i as broadcast pair constructor
                return (gpow[i, 0, 0], gpow[i, 0, 1],
                        gpow[i, 1, 0], gpow[i, 1, 1])

            lb0 = GL(jnp.broadcast_to(lbeta[0, 0], (n, num_subargs)),
                     jnp.broadcast_to(lbeta[0, 1], (n, num_subargs)))
            lb1 = GL(jnp.broadcast_to(lbeta[1, 0], (n, num_subargs)),
                     jnp.broadcast_to(lbeta[1, 1], (n, num_subargs)))
            agg0, agg1 = lb0, lb1
            lw = GL(vl[:, base_off:base_off + num_subargs * pw],
                    vh[:, base_off:base_off + num_subargs * pw])
            lw = lw.reshape(n, num_subargs, pw)
            for i in range(pw):
                col = GL(lw.lo[:, :, i], lw.hi[:, :, i])
                g0l, g0h, g1l, g1h = gp(i)
                agg0 = gl.add(agg0, gl.mul(col, GL(
                    jnp.broadcast_to(g0l, col.lo.shape),
                    jnp.broadcast_to(g0h, col.lo.shape))))
                agg1 = gl.add(agg1, gl.mul(col, GL(
                    jnp.broadcast_to(g1l, col.lo.shape),
                    jnp.broadcast_to(g1h, col.lo.shape))))
            if id_in_constant:
                # (n, n_tid) matrix: one shared column or one per repetition
                tid = GL(tid_l, tid_h)
                g0l, g0h, g1l, g1h = gp(width)
                agg0 = gl.add(agg0, gl.mul(tid, GL(
                    jnp.broadcast_to(g0l, tid.lo.shape),
                    jnp.broadcast_to(g0h, tid.lo.shape))))
                agg1 = gl.add(agg1, gl.mul(tid, GL(
                    jnp.broadcast_to(g1l, tid.lo.shape),
                    jnp.broadcast_to(g1h, tid.lo.shape))))
            a_polys = device.ext_inverse(GL2(agg0, agg1))  # (n, reps)
            if has_sel:
                sel = GL(sel_l[:, None], sel_h[:, None])
                a_polys = GL2(gl.mul(a_polys.c0, GL(
                    jnp.broadcast_to(sel.lo, a_polys.c0.lo.shape),
                    jnp.broadcast_to(sel.hi, a_polys.c0.lo.shape))),
                    gl.mul(a_polys.c1, GL(
                        jnp.broadcast_to(sel.lo, a_polys.c1.lo.shape),
                        jnp.broadcast_to(sel.hi, a_polys.c1.lo.shape))))
            for r in range(num_subargs):
                cols.append(GL2(a_polys.c0[:, r], a_polys.c1[:, r]))
            # B poly
            t0 = GL(jnp.broadcast_to(lbeta[0, 0], (n,)),
                    jnp.broadcast_to(lbeta[0, 1], (n,)))
            t1 = GL(jnp.broadcast_to(lbeta[1, 0], (n,)),
                    jnp.broadcast_to(lbeta[1, 1], (n,)))
            for i in range(num_table):
                col = GL(tbl_l[:, i], tbl_h[:, i])
                g0l, g0h, g1l, g1h = gp(i)
                t0 = gl.add(t0, gl.mul(col, GL(
                    jnp.broadcast_to(g0l, (n,)), jnp.broadcast_to(g0h, (n,)))))
                t1 = gl.add(t1, gl.mul(col, GL(
                    jnp.broadcast_to(g1l, (n,)), jnp.broadcast_to(g1h, (n,)))))
            b_inv = device.ext_inverse(GL2(t0, t1))
            m = GL(ml, mh)
            cols.append(GL2(gl.mul(b_inv.c0, m), gl.mul(b_inv.c1, m)))

        out_lo = jnp.stack(
            [a for e in cols for a in (e.c0.lo, e.c1.lo)], axis=1)
        out_hi = jnp.stack(
            [a for e in cols for a in (e.c0.hi, e.c1.hi)], axis=1)
        return out_lo, out_hi

    import jax
    return jax.jit(f)


def _bcast_pair(arr2, shape):
    """(2,) u32 leaf pair -> GL broadcast."""
    import jax.numpy as jnp
    return GL(jnp.broadcast_to(arr2[0], shape), jnp.broadcast_to(arr2[1], shape))


def _lookup_quotient_body(size, num_subargs, width, pw, base_off, a_off,
                          id_in_constant, has_sel, num_table, tid_idxes,
                          tbl_base, mult_idx, trans=False):
    """Traced body: all lookup quotient terms (A relations + B relation).
    Wrapped standalone by _lookup_quotient_jit and inlined whole into the
    fused full-quotient program (_quotient_full)."""
    import jax.numpy as jnp
    from ..field.extension import GL2

    def f(w_lo, w_hi, s_lo, s_hi, g2_lo, g2_hi, sel_lo, sel_hi,
          lbeta, gpow, alphas):
        if trans:
            # oracle flats arrive (k, size); XLA folds the transposes into
            # the column reads below
            w_lo, w_hi = w_lo.T, w_hi.T
            s_lo, s_hi = s_lo.T, s_hi.T
            g2_lo, g2_hi = g2_lo.T, g2_hi.T
        lw = GL(w_lo[:, base_off:base_off + num_subargs * pw],
                w_hi[:, base_off:base_off + num_subargs * pw])
        lw = lw.reshape(size, num_subargs, pw)
        agg0 = _bcast_pair(lbeta[0], (size, num_subargs))
        agg1 = _bcast_pair(lbeta[1], (size, num_subargs))
        for i in range(pw):
            coli = GL(lw.lo[:, :, i], lw.hi[:, :, i])
            agg0 = gl.add(agg0, gl.mul(coli, _bcast_pair(gpow[i, 0], coli.lo.shape)))
            agg1 = gl.add(agg1, gl.mul(coli, _bcast_pair(gpow[i, 1], coli.lo.shape)))
        if id_in_constant:
            # per-rep id constant column (shared mode: all entries equal)
            cols = np.asarray([tid_idxes[min(r, len(tid_idxes) - 1)]
                               for r in range(num_subargs)])
            tid = GL(s_lo[:, cols], s_hi[:, cols])  # (size, reps)
            agg0 = gl.add(agg0, gl.mul(tid, _bcast_pair(gpow[width, 0],
                                                        tid.lo.shape)))
            agg1 = gl.add(agg1, gl.mul(tid, _bcast_pair(gpow[width, 1],
                                                        tid.lo.shape)))
        a_idx0 = np.asarray([a_off + 2 * r for r in range(num_subargs)])
        a_idx1 = a_idx0 + 1
        a_poly = GL2(GL(g2_lo[:, a_idx0], g2_hi[:, a_idx0]),
                     GL(g2_lo[:, a_idx1], g2_hi[:, a_idx1]))
        prod = ext2.mul(a_poly, GL2(agg0, agg1))  # (size, reps)
        if has_sel:
            sub0 = GL(jnp.broadcast_to(sel_lo[:, None], prod.c0.lo.shape),
                      jnp.broadcast_to(sel_hi[:, None], prod.c0.lo.shape))
        else:
            sub0 = gl.ones((size, num_subargs))
        prod = GL2(gl.sub(prod.c0, sub0), prod.c1)
        # per-rep alpha scale + sum over reps (alphas[num_subargs] is B's)
        al = alphas[:num_subargs]  # (reps, 2, 2)
        a_ext = GL2(GL(al[None, :, 0, 0], al[None, :, 0, 1]),
                    GL(al[None, :, 1, 0], al[None, :, 1, 1]))
        scaled = ext2.mul(prod, GL2(
            GL(jnp.broadcast_to(a_ext.c0.lo, prod.c0.lo.shape),
               jnp.broadcast_to(a_ext.c0.hi, prod.c0.lo.shape)),
            GL(jnp.broadcast_to(a_ext.c1.lo, prod.c1.lo.shape),
               jnp.broadcast_to(a_ext.c1.hi, prod.c1.lo.shape))))
        acc0 = device._sum_gl(scaled.c0, axis=1)
        acc1 = device._sum_gl(scaled.c1, axis=1)
        # B term
        t0 = _bcast_pair(lbeta[0], (size,))
        t1 = _bcast_pair(lbeta[1], (size,))
        for i in range(num_table):
            coli = GL(s_lo[:, tbl_base + i], s_hi[:, tbl_base + i])
            t0 = gl.add(t0, gl.mul(coli, _bcast_pair(gpow[i, 0], (size,))))
            t1 = gl.add(t1, gl.mul(coli, _bcast_pair(gpow[i, 1], (size,))))
        b_off = a_off + 2 * num_subargs
        b_poly = GL2(GL(g2_lo[:, b_off], g2_hi[:, b_off]),
                     GL(g2_lo[:, b_off + 1], g2_hi[:, b_off + 1]))
        term = ext2.mul(b_poly, GL2(t0, t1))
        m = GL(w_lo[:, mult_idx], w_hi[:, mult_idx])
        term = GL2(gl.sub(term.c0, m), term.c1)
        b_alpha = GL2(_bcast_pair(alphas[num_subargs, 0], (size,)),
                      _bcast_pair(alphas[num_subargs, 1], (size,)))
        term = ext2.mul(term, b_alpha)
        acc0 = gl.add(acc0, term.c0)
        acc1 = gl.add(acc1, term.c1)
        return acc0.lo, acc0.hi, acc1.lo, acc1.hi

    return f


@functools.lru_cache(maxsize=None)
def _lookup_quotient_jit(*params):
    """All lookup quotient terms (A relations + B relation) in one program."""
    import jax
    return jax.jit(_lookup_quotient_body(*params))


def _copyperm_quotient_body(size, n, qd, num_var, num_inter, trans=False):
    """Traced body: boundary + ALL grand-product recurrence relations —
    per relation, its qd columns' affine factors are built as (size, qd)
    blocks and tree-multiplied. Wrapped by _copyperm_quotient_jit; inlined
    into _quotient_full."""
    import jax.numpy as jnp
    from ..field.extension import GL2

    num_rel = num_inter + 1

    def f(w_lo, w_hi, s_lo, s_hi, x_lo, x_hi, nrl, nrh, g2_lo, g2_hi,
          zs0l, zs0h, zs1l, zs1h, l1_lo, l1_hi, beta, gamma, alphas):
        if trans:
            w_lo, w_hi = w_lo.T, w_hi.T
            s_lo, s_hi = s_lo.T, s_hi.T
            g2_lo, g2_hi = g2_lo.T, g2_hi.T
        z = GL2(GL(g2_lo[:, 0], g2_hi[:, 0]), GL(g2_lo[:, 1], g2_hi[:, 1]))
        inters = [GL2(GL(g2_lo[:, 2 + 2 * i], g2_hi[:, 2 + 2 * i]),
                      GL(g2_lo[:, 3 + 2 * i], g2_hi[:, 3 + 2 * i]))
                  for i in range(num_inter)]
        z_shift = GL2(GL(zs0l, zs0h), GL(zs1l, zs1h))
        # boundary: (z - 1)·L1·α₀
        zm1 = GL2(gl.sub(z.c0, gl.ones((size,))), z.c1)
        l1 = GL(l1_lo, l1_hi)
        bterm = GL2(gl.mul(zm1.c0, l1), gl.mul(zm1.c1, l1))
        a0 = GL2(_bcast_pair(alphas[0, 0], (size,)),
                 _bcast_pair(alphas[0, 1], (size,)))
        accv = ext2.mul(bterm, a0)
        acc0, acc1 = accv.c0, accv.c1

        def affine_block(base_arr, other):
            b0 = _bcast_pair(beta[0], other.lo.shape)
            b1 = _bcast_pair(beta[1], other.lo.shape)
            g0 = _bcast_pair(gamma[0], other.lo.shape)
            g1 = _bcast_pair(gamma[1], other.lo.shape)
            return GL2(gl.add(gl.add(base_arr, gl.mul(other, b0)), g0),
                       gl.add(gl.mul(other, b1), g1))

        lhs_list = inters + [z_shift]
        rhs_list = [z] + inters
        x = GL(x_lo, x_hi)
        for rel in range(num_rel):
            j0 = rel * qd
            j1 = min(j0 + qd, num_var)
            w = GL(w_lo[:, j0:j1], w_hi[:, j0:j1])
            sg = GL(s_lo[:, j0:j1], s_hi[:, j0:j1])
            nrx = gl.mul(GL(x.lo[:, None], x.hi[:, None]),
                         GL(nrl[None, j0:j1], nrh[None, j0:j1]))
            dens = affine_block(w, sg)
            nums = affine_block(w, nrx)
            den_p = _ext_prod_last(dens)
            num_p = _ext_prod_last(nums)
            lhs_acc = ext2.mul(lhs_list[rel], den_p)
            rhs_acc = ext2.mul(rhs_list[rel], num_p)
            term = ext2.sub(lhs_acc, rhs_acc)
            a = GL2(_bcast_pair(alphas[rel + 1, 0], (size,)),
                    _bcast_pair(alphas[rel + 1, 1], (size,)))
            term = ext2.mul(term, a)
            acc0 = gl.add(acc0, term.c0)
            acc1 = gl.add(acc1, term.c1)
        return acc0.lo, acc0.hi, acc1.lo, acc1.hi

    return f


@functools.lru_cache(maxsize=None)
def _copyperm_quotient_jit(*params):
    """Boundary + all grand-product recurrence relations in one program."""
    import jax
    return jax.jit(_copyperm_quotient_body(*params))


@functools.lru_cache(maxsize=None)
def _z_shift_lde_jit(n: int, qd: int):
    """slice z-poly monomials + ω-scale + qd-coset LDE + flat ext layout,
    as ONE program (replaces an eager chain of tunnel dispatches)."""
    import jax
    import jax.numpy as jnp

    def f(m_lo, m_hi, sp_lo, sp_hi):
        z_mono = GL(m_lo[:, 0:2], m_hi[:, 0:2])
        zs = gl.mul(z_mono, GL(sp_lo[:, None], sp_hi[:, None]))
        lde = device.monomials_to_lde(zs, qd).reshape(qd * n, 2)
        return lde.lo[:, 0], lde.hi[:, 0], lde.lo[:, 1], lde.hi[:, 1]

    return jax.jit(f)


def _intt_coset_body(log_size):
    from ..ntt import ntt as jntt

    g = gl.MULTIPLICATIVE_GENERATOR
    if log_size >= 14:
        return lambda x: jntt.coset_intt_fourstep_cols(x, int(g))
    plan = jntt.get_plan(log_size)
    return lambda x: jntt.coset_intt_cols(x, g, plan)


@functools.lru_cache(maxsize=None)
def _intt_coset_jit(log_size):
    # large single-poly iNTT: four-step keeps the passes wide and the
    # compiled graphs half-depth (a direct (2^19, 2) program compiled
    # for minutes on the axon backend)
    import jax
    return jax.jit(_intt_coset_body(log_size))


@functools.lru_cache(maxsize=None)
def _deep_jit(fsize, layout, trans=False):
    """One fused program for the whole DEEP/quotening combination
    (reference: quotening_operation_in_extension, prover.rs:2397,2523).

    ``layout`` is a tuple of groups (one per opening point); each group is a
    tuple of source descriptors ``(oracle_id, c0, c1)`` with oracle ids
    0=witness 1=setup 2=stage2 3=quotient and ``c1 == -1`` marking a
    base-field column.  Challenges/values/points ride as u32 arrays so
    nothing recompiles across proofs.  Replaces ~3 dispatches per source
    (hundreds of tiny tunnel round-trips) with a single dispatch."""
    import jax
    import jax.numpy as jnp

    from ..field.extension import GL2

    def _bc(c22, shape):
        return GL2(GL(jnp.broadcast_to(c22[0, 0], shape),
                      jnp.broadcast_to(c22[0, 1], shape)),
                   GL(jnp.broadcast_to(c22[1, 0], shape),
                      jnp.broadcast_to(c22[1, 1], shape)))

    def f(w_lo, w_hi, s_lo, s_hi, t2_lo, t2_hi, q_lo, q_hi,
          x_lo, x_hi, points, lams, vals):
        if trans:
            # oracle flats arrive (k, fsize); XLA folds the transposes into
            # the ~170 per-source column reads below — strided column loads
            # of the row-major layout dragged whole 128-lane tiles (~90 GB
            # of wasted HBM traffic per prove, round-5 profiling)
            w_lo, w_hi = w_lo.T, w_hi.T
            s_lo, s_hi = s_lo.T, s_hi.T
            t2_lo, t2_hi = t2_lo.T, t2_hi.T
            q_lo, q_hi = q_lo.T, q_hi.T
        mats = ((w_lo, w_hi), (s_lo, s_hi), (t2_lo, t2_hi), (q_lo, q_hi))
        zero = jnp.zeros((fsize,), jnp.uint32)
        x = GL2(GL(x_lo, x_hi), GL(zero, zero))
        h = GL2(GL(zero, zero), GL(zero, zero))
        ch = 0
        for g, group in enumerate(layout):
            acc = GL2(GL(zero, zero), GL(zero, zero))
            for (oid, c0, c1) in group:
                lo, hi = mats[oid]
                if c1 < 0:
                    src = GL2(GL(lo[:, c0], hi[:, c0]), GL(zero, zero))
                else:
                    src = GL2(GL(lo[:, c0], hi[:, c0]),
                              GL(lo[:, c1], hi[:, c1]))
                diff = ext2.sub(src, _bc(vals[ch], (fsize,)))
                acc = ext2.add(acc, ext2.mul(diff, _bc(lams[ch], (fsize,))))
                ch += 1
            den = ext2.sub(x, _bc(points[g], (fsize,)))
            h = ext2.add(h, ext2.mul(acc, device.ext_inverse(den)))
        return h.c0.lo, h.c0.hi, h.c1.lo, h.c1.hi

    return jax.jit(f)
