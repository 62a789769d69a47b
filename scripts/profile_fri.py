"""Per-round timing of the device FRI pipeline on the current backend.

Replicates do_fri_device's exact call sequence on flagship-shaped data
(2^19 base layer, schedule [3,3,3,3,3]) with a scripted transcript, and
times every piece separately: host roots table, uploads, stage-0 commit,
each fused fold+commit program, cap downloads, final interpolation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


class ScriptedTranscript:
    """Absorbs caps (forcing the device sync) and returns fixed challenges."""

    def __init__(self):
        self.absorbed = 0

    def witness_merkle_tree_cap(self, cap):
        self.absorbed += len(cap)

    def get_challenge(self):
        return 12345678901234567 + self.absorbed

    def get_multiple_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]


def main(log_base=19, schedule=(3, 3, 3, 3, 3), lde=8, cap_size=16):
    import jax
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.prover import device_merkle as dm

    n = 1 << log_base
    rng = np.random.default_rng(0)
    host = rng.integers(0, gl.ORDER, size=(4, n), dtype=np.uint64)

    def t(label, fn, *args, sync=True):
        t0 = time.time()
        out = fn(*args)
        if sync:
            jax.block_until_ready(out)
        print("%-34s %7.3fs" % (label, time.time() - t0), flush=True)
        return out

    print(f"backend={jax.default_backend()} base=2^{log_base} "
          f"schedule={list(schedule)}", flush=True)

    h_a = t("upload base layer (16 MB)", lambda: tuple(
        jax.numpy.asarray(((host[i] >> np.uint64(32 * p)) &
                           np.uint64(0xFFFFFFFF)).astype(np.uint32))
        for i in range(4) for p in (0, 1)))
    h_a = (h_a[0], h_a[1], h_a[2], h_a[3])  # c0.lo c0.hi c1.lo c1.hi

    def run_total(label):
        # random data is not low-degree: the final-degree assert fires AFTER
        # all device work + host interpolation, so timing-to-exception is the
        # full pipeline cost
        t0 = time.time()
        try:
            dm.do_fri_device(h_a, ScriptedTranscript(), list(schedule), lde,
                             cap_size, "poseidon2",
                             verbose=label.startswith("warm"))
        except AssertionError:
            pass
        print("%-34s %7.3fs" % (label, time.time() - t0), flush=True)

    run_total("cold do_fri_device")
    run_total("warm do_fri_device #0")
    run_total("warm do_fri_device #1")

    # ---- piecewise ----
    from boojum_tpu.prover.fri import _inverse_roots_bitreversed
    roots = t("host roots table 2^18", _inverse_roots_bitreversed, n,
              sync=False)
    rl = t("upload rl", lambda: jax.numpy.asarray(
        (roots & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    rh = jax.numpy.asarray((roots >> np.uint64(32)).astype(np.uint32))
    jax.block_until_ready(rh)

    c0l, c0h, c1l, c1h = h_a
    # stage 0 commit
    k0 = schedule[0]
    cl, ch = dm._fri_leaf_cols_jit(n, 1 << k0)(c0l, c0h, c1l, c1h)
    jax.block_until_ready(cl)
    t0 = time.time()
    cl, ch = dm._fri_leaf_cols_jit(n, 1 << k0)(c0l, c0h, c1l, c1h)
    tree = dm._tree_from_leaf_cols(gl.GL(cl, ch), cap_size)
    jax.block_until_ready(tree.layers[-1][0])
    print("%-34s %7.3fs" % ("stage0 leafcols+tree (warm)",
                            time.time() - t0), flush=True)
    t0 = time.time()
    cap = jax.device_get(tree.layers[-1])
    print("%-34s %7.3fs" % ("stage0 cap download", time.time() - t0),
          flush=True)

    # fused rounds
    chs = np.ones((3, 2, 2), np.uint32)
    cosets = np.ones((3, 2), np.uint32)
    cur0, cur1 = gl.GL(c0l, c0h), gl.GL(c1l, c1h)
    size = n
    for stage in range(1, len(schedule)):
        k_prev, k = schedule[stage - 1], schedule[stage]
        f = dm._fold_commit_jit(size, k_prev, k, cap_size)
        out = f(cur0.lo, cur0.hi, cur1.lo, cur1.hi, rl, rh, chs, cosets)
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = f(cur0.lo, cur0.hi, cur1.lo, cur1.hi, rl, rh, chs, cosets)
        jax.block_until_ready(out[-1])
        dt = time.time() - t0
        t0 = time.time()
        _ = jax.device_get((out[-2], out[-1]))
        dl = time.time() - t0
        print("round %d (2^%2d -> 2^%2d)  program %6.3fs  cap-dl %6.3fs"
              % (stage, size.bit_length() - 1,
                 (size >> k_prev).bit_length() - 1, dt, dl), flush=True)
        size >>= k_prev
        cur0 = gl.GL(out[0], out[1])
        cur1 = gl.GL(out[2], out[3])


if __name__ == "__main__":
    main()
