"""Per-step profile of the witness-oracle pipeline on the current backend.

Times: host materialize -> upload -> iNTT -> LDE -> leaf hash -> node
layers -> cap download, each synced, on flagship-shaped data. Run on the
real TPU to see where the witness-oracle wall clock goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(log_n=16, cols=148, lde=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.prover import device
    from boojum_tpu.prover.device_merkle import (_leaf_jit, _node_jit,
                                                 _pad_cols_to_rate,
                                                 build_device_tree)

    n = 1 << log_n
    rng = np.random.default_rng(0)
    host = rng.integers(0, gl.ORDER, size=(cols, n), dtype=np.uint64)

    def sync(x):
        jax.block_until_ready(x)
        return x

    def t(label, fn, *args):
        t0 = time.time()
        out = sync(fn(*args))
        dt = time.time() - t0
        print("%-28s %7.2fs" % (label, dt), flush=True)
        return out

    # warm everything once (compiles)
    print("== cold (includes compiles) ==", flush=True)
    dev = t("upload(to_device_cols)", device.to_device_cols, host)
    mono = t("cols_to_monomials", device.cols_to_monomials, dev)
    ldearr = t("monomials_to_lde", device.monomials_to_lde, mono, lde)
    flat = ldearr.reshape(lde * n, cols)
    leaf_cols = gl.GL(flat.lo.T, flat.hi.T)
    padded = _pad_cols_to_rate(leaf_cols)
    k, m = padded.shape
    lj = _leaf_jit(k, m)
    leaves = t("leaf hash", lambda: gl.GL(*lj(padded.lo, padded.hi)))
    t("full tree build", build_device_tree, leaf_cols, 16)

    print("== warm ==", flush=True)
    for _ in range(2):
        t0 = time.time()
        dev = sync(device.to_device_cols(host))
        t_up = time.time() - t0
        t0 = time.time()
        mono = sync(device.cols_to_monomials(dev))
        t_mono = time.time() - t0
        t0 = time.time()
        ldearr = sync(device.monomials_to_lde(mono, lde))
        t_lde = time.time() - t0
        flat = ldearr.reshape(lde * n, cols)
        leaf_cols = gl.GL(flat.lo.T, flat.hi.T)
        t0 = time.time()
        padded = _pad_cols_to_rate(leaf_cols)
        leaves = sync(gl.GL(*lj(padded.lo, padded.hi)))
        t_leaf = time.time() - t0
        t0 = time.time()
        tree = build_device_tree(leaf_cols, 16)
        cap = tree.get_cap()
        t_tree = time.time() - t0
        print("upload %.2f mono %.2f lde %.2f leaf %.2f tree+cap %.2f"
              % (t_up, t_mono, t_lde, t_leaf, t_tree), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
