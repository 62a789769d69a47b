"""Device-resident prover stages (the TPU path).

The host path in prover.py materializes every LDE on the host and runs the
bulk protocol math in numpy — fine as a dev backend, but on a real chip the
transfers dominate (hundreds of MB per oracle over PCIe/tunnel). These
jitted stages keep all bulk arrays on device as GL/GL2 limb tensors; only
transcript scalars (β, γ, α, z, DEEP challenges) cross, passed as tiny u32
arrays so one compilation serves every proof of a circuit shape.

Gate evaluation reuses the SAME GateEvaluator.evaluate bodies over GLOps —
the ops-protocol payoff (SURVEY §1's single-evaluator convention).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..cs.gates.base import GLOps, TraceView
from ..field import extension as ext2
from ..field import goldilocks as gl
from ..field.extension import GL2
from ..field.goldilocks import GL
from ..ntt import ntt
from ..utils import npgl
from . import device

P = npgl.ORDER


@dataclass
class ProverLayout:
    """Static per-circuit layout shared by the device stage builders."""

    n: int
    qd: int
    fri_lde: int
    num_var: int
    num_wit: int
    num_mult: int
    num_const: int
    num_table: int
    tid_const_idx: int  # index into constant columns, or -1
    num_intermediates: int
    evaluators: list
    selector_paths: list
    geometry: object
    lp_info: tuple | None  # (width, reps, pw, base_off)
    non_res: list


def scalar_ext(c) -> np.ndarray:
    """(c0, c1) ints -> (2, 2) u32 [[c0lo, c0hi], [c1lo, c1hi]]."""
    return np.asarray([[c[0] & 0xFFFFFFFF, c[0] >> 32],
                       [c[1] & 0xFFFFFFFF, c[1] >> 32]], np.uint32)


def scalars_ext(cs_list) -> np.ndarray:
    return np.stack([scalar_ext(c) for c in cs_list]) if cs_list else \
        np.zeros((0, 2, 2), np.uint32)


def _e(carr) -> GL2:
    """(2, 2) u32 scalar -> GL2 scalar (broadcasts in ops)."""
    return GL2(GL(carr[0, 0], carr[0, 1]), GL(carr[1, 0], carr[1, 1]))


def _scaled(b: GL, carr) -> GL2:
    """base array × ext scalar."""
    return GL2(gl.mul(b, GL(jnp.broadcast_to(carr[0, 0], b.shape),
                            jnp.broadcast_to(carr[0, 1], b.shape))),
               gl.mul(b, GL(jnp.broadcast_to(carr[1, 0], b.shape),
                            jnp.broadcast_to(carr[1, 1], b.shape))))


def _add_scalar(a: GL2, carr) -> GL2:
    shape = a.c0.shape
    s = GL2(GL(jnp.broadcast_to(carr[0, 0], shape),
               jnp.broadcast_to(carr[0, 1], shape)),
            GL(jnp.broadcast_to(carr[1, 0], shape),
               jnp.broadcast_to(carr[1, 1], shape)))
    return ext2.add(a, s)


def _mul_scalar_ext(a: GL2, carr) -> GL2:
    shape = a.c0.shape
    s = GL2(GL(jnp.broadcast_to(carr[0, 0], shape),
               jnp.broadcast_to(carr[0, 1], shape)),
            GL(jnp.broadcast_to(carr[1, 0], shape),
               jnp.broadcast_to(carr[1, 1], shape)))
    return ext2.mul(a, s)


def _from_base(b: GL) -> GL2:
    return GL2(b, gl.zeros(b.shape))


# ---------------------------------------------------------------------------
# stages 2+3: copy-permutation products + lookup A/B on the base domain
# ---------------------------------------------------------------------------


def build_stage2_fn(L: ProverLayout):
    n = L.n
    x_host = npgl.powers(gl.domain_generator(n.bit_length() - 1), n)
    num_chunks = L.num_intermediates + 1

    def fn(vars_lo, vars_hi, sigmas_lo, sigmas_hi, tables_lo, tables_hi,
           mult_lo, mult_hi, tid_lo, tid_hi, beta, gamma, lookup_beta,
           gamma_pows):
        vars_dev = GL(vars_lo, vars_hi)  # (n, num_var)
        sigmas = GL(sigmas_lo, sigmas_hi)
        x = gl.from_u64(x_host)

        chunks = []
        for c in range(num_chunks):
            num_acc = device.ext_const((1, 0), (n,))
            den_acc = device.ext_const((1, 0), (n,))
            for j in range(c * L.qd, min((c + 1) * L.qd, L.num_var)):
                w = vars_dev[:, j]
                bx = gl.mul(x, gl.full((), L.non_res[j]))
                num_j = _add_scalar(ext2.add(_from_base(w), _scaled(bx, beta)),
                                    gamma)
                den_j = _add_scalar(ext2.add(_from_base(w),
                                             _scaled(sigmas[:, j], beta)), gamma)
                num_acc = ext2.mul(num_acc, num_j)
                den_acc = ext2.mul(den_acc, den_j)
            chunks.append(ext2.mul(num_acc, device.ext_inverse(den_acc)))

        total = chunks[0]
        for c in chunks[1:]:
            total = ext2.mul(total, c)
        z = device.grand_product_exclusive(total)
        outs = [z.c0.lo, z.c0.hi, z.c1.lo, z.c1.hi]
        prev = z
        for c in chunks[:-1]:
            prev = ext2.mul(prev, c)
            outs.extend([prev.c0.lo, prev.c0.hi, prev.c1.lo, prev.c1.hi])

        if L.lp_info is not None:
            width, reps, pw, base_off = L.lp_info
            tables = GL(tables_lo, tables_hi)
            tid = GL(tid_lo, tid_hi)
            for rep in range(reps):
                agg = _add_scalar(GL2(gl.zeros((n,)), gl.zeros((n,))), lookup_beta)
                for i in range(width):
                    col = vars_dev[:, base_off + rep * pw + i]
                    agg = ext2.add(agg, _scaled(col, gamma_pows[i]))
                agg = ext2.add(agg, _scaled(tid, gamma_pows[width]))
                a_poly = device.ext_inverse(agg)
                outs.extend([a_poly.c0.lo, a_poly.c0.hi,
                             a_poly.c1.lo, a_poly.c1.hi])
            agg_t = _add_scalar(GL2(gl.zeros((n,)), gl.zeros((n,))), lookup_beta)
            for i in range(L.num_table):
                agg_t = ext2.add(agg_t, _scaled(tables[:, i], gamma_pows[i]))
            b_poly = device.ext_mul_base(device.ext_inverse(agg_t),
                                         GL(mult_lo, mult_hi))
            outs.extend([b_poly.c0.lo, b_poly.c0.hi, b_poly.c1.lo, b_poly.c1.hi])
        return outs

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# stage 6+7a: quotient accumulation + vanishing division + full iNTT
# ---------------------------------------------------------------------------


def build_quotient_fn(L: ProverLayout):
    n, qd = L.n, L.qd
    size = qd * n
    x_lde_host = device.x_poly_lde_host(n, qd).reshape(-1)
    l1_host = device.unnormalized_l1_lde_host(n, qd).reshape(-1)
    vanish_host = np.repeat(device.vanishing_inverse_per_coset(n, qd), n)

    def fn(w_lo, w_hi, s_lo, s_hi, g2_lo, g2_hi, zs_lo, zs_hi,
           beta, gamma, lookup_beta, gamma_pows, alphas):
        """w: (size, num_w) witness flat LDE [vars ++ wits ++ mults];
        s: (size, num_s) setup flat [sigmas ++ consts ++ tables];
        g2: (size, num_g2) stage2 flat [z, inters, A, B as c0/c1 pairs];
        zs: (size, 2) z-shifted flat; scalars as u32 arrays."""
        witness = GL(w_lo, w_hi)
        setup = GL(s_lo, s_hi)
        stage2 = GL(g2_lo, g2_hi)
        z_shift = GL2(GL(zs_lo[:, 0], zs_hi[:, 0]), GL(zs_lo[:, 1], zs_hi[:, 1]))
        x_lde = gl.from_u64(x_lde_host)

        var_flat = [witness[:, i] for i in range(L.num_var)]
        wit_flat = [witness[:, L.num_var + i] for i in range(L.num_wit)]
        mult_flat = [witness[:, L.num_var + L.num_wit + i]
                     for i in range(L.num_mult)]
        sigma_flat = [setup[:, i] for i in range(L.num_var)]
        const_flat = [setup[:, L.num_var + i] for i in range(L.num_const)]
        table_flat = [setup[:, L.num_var + L.num_const + i]
                      for i in range(L.num_table)]
        g2_flat = [stage2[:, i] for i in range(stage2.lo.shape[1])]

        acc = GL2(gl.zeros((size,)), gl.zeros((size,)))
        ai = 0

        # 6a. lookup terms
        if L.lp_info is not None:
            width, reps, pw, base_off = L.lp_info
            tid_flat = const_flat[L.tid_const_idx]
            a_off = 2 * (1 + L.num_intermediates)
            for rep in range(reps):
                agg = _add_scalar(GL2(gl.zeros((size,)), gl.zeros((size,))),
                                  lookup_beta)
                for i in range(width):
                    col = var_flat[base_off + rep * pw + i]
                    agg = ext2.add(agg, _scaled(col, gamma_pows[i]))
                agg = ext2.add(agg, _scaled(tid_flat, gamma_pows[width]))
                a_poly = GL2(g2_flat[a_off + 2 * rep], g2_flat[a_off + 2 * rep + 1])
                term = ext2.mul(a_poly, agg)
                term = GL2(gl.sub(term.c0, gl.ones(())), term.c1)
                acc = ext2.add(acc, _mul_scalar_ext(term, alphas[ai]))
                ai += 1
            agg_t = _add_scalar(GL2(gl.zeros((size,)), gl.zeros((size,))),
                                lookup_beta)
            for i in range(L.num_table):
                agg_t = ext2.add(agg_t, _scaled(table_flat[i], gamma_pows[i]))
            b_off = a_off + 2 * reps
            b_poly = GL2(g2_flat[b_off], g2_flat[b_off + 1])
            term = ext2.mul(b_poly, agg_t)
            term = GL2(gl.sub(term.c0, mult_flat[0]), term.c1)
            acc = ext2.add(acc, _mul_scalar_ext(term, alphas[ai]))
            ai += 1

        # 6c. general gates × selector path products
        sel_cache = {}

        def selector_product(path):
            key = tuple(path)
            if key not in sel_cache:
                prod = gl.ones((size,))
                for k, bit in enumerate(path):
                    col = const_flat[k]
                    prod = gl.mul(prod, col if bit else gl.sub(gl.ones(()), col))
                sel_cache[key] = prod
            return sel_cache[key]

        for ev_idx, ev in enumerate(L.evaluators):
            if ev.num_quotient_terms == 0:
                continue
            path = L.selector_paths[ev_idx]
            sel = selector_product(path)
            src = TraceView(var_flat, wit_flat, const_flat[len(path):])
            terms = ev.evaluate_repetitions(src, GLOps, L.geometry)
            for term in terms:
                contrib = gl.mul(term, sel)
                acc = ext2.add(acc, _scaled(contrib, alphas[ai]))
                ai += 1

        # 6d. copy permutation: boundary + recurrences
        l1 = gl.from_u64(l1_host)
        z_flat = GL2(g2_flat[0], g2_flat[1])
        zm1 = GL2(gl.sub(z_flat.c0, gl.ones(())), z_flat.c1)
        acc = ext2.add(acc, _mul_scalar_ext(device.ext_mul_base(zm1, l1),
                                            alphas[ai]))
        ai += 1

        lhs_list = [GL2(g2_flat[2 + 2 * i], g2_flat[3 + 2 * i])
                    for i in range(L.num_intermediates)] + [z_shift]
        rhs_list = [z_flat] + [GL2(g2_flat[2 + 2 * i], g2_flat[3 + 2 * i])
                               for i in range(L.num_intermediates)]
        for rel_idx, (lhs, rhs) in enumerate(zip(lhs_list, rhs_list)):
            lhs_acc, rhs_acc = lhs, rhs
            for j in range(rel_idx * qd, min((rel_idx + 1) * qd, L.num_var)):
                w = var_flat[j]
                den = _add_scalar(ext2.add(_from_base(w),
                                           _scaled(sigma_flat[j], beta)), gamma)
                bx = gl.mul(x_lde, gl.full((), L.non_res[j]))
                num_ = _add_scalar(ext2.add(_from_base(w), _scaled(bx, beta)),
                                   gamma)
                lhs_acc = ext2.mul(lhs_acc, den)
                rhs_acc = ext2.mul(rhs_acc, num_)
            acc = ext2.add(acc, _mul_scalar_ext(ext2.sub(lhs_acc, rhs_acc),
                                                alphas[ai]))
            ai += 1

        # stage 7 head: vanishing division + full-domain coset iNTT
        vi = gl.from_u64(vanish_host)
        acc = device.ext_mul_base(GL2(acc.c0, acc.c1), vi)
        plan = ntt.get_plan(size.bit_length() - 1)
        g = gl.MULTIPLICATIVE_GENERATOR
        q0 = ntt.coset_intt_cols(ntt_reshape(acc.c0, size), g, plan)
        q1 = ntt.coset_intt_cols(ntt_reshape(acc.c1, size), g, plan)
        return q0.lo[:, 0], q0.hi[:, 0], q1.lo[:, 0], q1.hi[:, 0]

    return jax.jit(fn)


def ntt_reshape(a: GL, size: int) -> GL:
    return GL(a.lo.reshape(size, 1), a.hi.reshape(size, 1))


# ---------------------------------------------------------------------------
# stage 9: DEEP combination over the fri_lde flat domain
# ---------------------------------------------------------------------------


def build_deep_fn(L: ProverLayout, num_sources_z: int, base_mask_z: list,
                  num_sources_0: int, pub_cols: list):
    """base_mask_z[i] True if source i at z is a base poly (c1 = 0).
    pub_cols: list of (open_at_scalar_idx, column) pairs flattened by caller;
    here we only need counts — the function takes stacked source arrays."""
    n, fri_lde = L.n, L.fri_lde
    fsize = fri_lde * n
    x_host = device.x_poly_lde_host(n, fri_lde).reshape(-1)

    def fn(src_z_lo, src_z_hi, vals_z, zw_src_lo, zw_src_hi, val_zw,
           src0_lo, src0_hi, vals_0, pub_lo, pub_hi, pub_vals, pub_points,
           z_arr, zw_arr, lambdas):
        """src_z: (fsize, num_sources_z, 2) [c0 col, c1 col] with c1 zeros for
        base; vals_z: (num_sources_z, 2, 2); lambdas: (T, 2, 2);
        pub: (fsize, n_pub), pub_vals (n_pub, 2, 2), pub_points (n_pub, 2, 2)."""
        x = gl.from_u64(x_host)
        h = GL2(gl.zeros((fsize,)), gl.zeros((fsize,)))
        li = 0

        def quotening(acc_sources, values, point_arr, h, li):
            acc = GL2(gl.zeros((fsize,)), gl.zeros((fsize,)))
            for s, v in acc_sources:
                diff = ext2.sub(s, _e_broadcast(v, (fsize,)))
                acc = ext2.add(acc, _mul_scalar_ext(diff, lambdas[li]))
                li += 1
                values.append(None)
            den = ext2.sub(_from_base(x), _e_broadcast(point_arr, (fsize,)))
            acc = ext2.mul(acc, device.ext_inverse(den))
            return ext2.add(h, acc), li

        srcs = []
        for i in range(num_sources_z):
            srcs.append((GL2(GL(src_z_lo[:, i, 0], src_z_hi[:, i, 0]),
                             GL(src_z_lo[:, i, 1], src_z_hi[:, i, 1])),
                         vals_z[i]))
        h, li = quotening(srcs, [], z_arr, h, li)

        zw_src = GL2(GL(zw_src_lo[:, 0], zw_src_hi[:, 0]),
                     GL(zw_src_lo[:, 1], zw_src_hi[:, 1]))
        h, li = quotening([(zw_src, val_zw)], [], zw_arr, h, li)

        if num_sources_0 > 0:
            srcs0 = []
            for i in range(num_sources_0):
                srcs0.append((GL2(GL(src0_lo[:, i, 0], src0_hi[:, i, 0]),
                                  GL(src0_lo[:, i, 1], src0_hi[:, i, 1])),
                              vals_0[i]))
            zero_pt = jnp.zeros((2, 2), jnp.uint32)
            h, li = quotening(srcs0, [], zero_pt, h, li)

        for i in range(len(pub_cols)):
            src = GL2(GL(pub_lo[:, i], pub_hi[:, i]), gl.zeros((fsize,)))
            acc = _mul_scalar_ext(ext2.sub(src, _e_broadcast(pub_vals[i], (fsize,))),
                                  lambdas[li])
            li += 1
            den = ext2.sub(_from_base(x), _e_broadcast(pub_points[i], (fsize,)))
            h = ext2.add(h, ext2.mul(acc, device.ext_inverse(den)))

        return h.c0.lo, h.c0.hi, h.c1.lo, h.c1.hi

    return jax.jit(fn)


def _e_broadcast(carr, shape) -> GL2:
    return GL2(GL(jnp.broadcast_to(carr[0, 0], shape),
                  jnp.broadcast_to(carr[0, 1], shape)),
               GL(jnp.broadcast_to(carr[1, 0], shape),
                  jnp.broadcast_to(carr[1, 1], shape)))
