"""Time the device-transcript scalar-chain programs (power tables, flush,
challenges) — long sequential scalar scans are suspect per-iteration-overhead
hogs on the TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()
import jax, jax.numpy as jnp, numpy as np

def get1(a):
    return np.asarray(jax.device_get(a.reshape(-1)[:1]))

def bench(name, f, *args, reps=5):
    o = f(*args); leaves = jax.tree_util.tree_leaves(o); get1(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args); leaves = jax.tree_util.tree_leaves(o); get1(leaves[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:<44s} {(ts[len(ts)//2]-BASE)*1e3:9.2f} ms", flush=True)

rng = np.random.default_rng(4)
x0 = jnp.asarray(np.arange(8, dtype=np.uint32)); get1(x0)
ts = []
for _ in range(8):
    t0 = time.perf_counter(); get1(x0); ts.append(time.perf_counter() - t0)
ts.sort(); BASE = ts[len(ts)//2]
print(f"baseline get: {BASE*1e3:.2f} ms", flush=True)

from boojum_tpu.prover.device_transcript import (_ext_pow_table_jit,
                                                 _sq_chain_jit, _perm_jit,
                                                 _flush_jit)
ch = jnp.asarray(rng.integers(0, 1 << 31, (2, 2)).astype(np.uint32))
bench("ext_pow_table 173", _ext_pow_table_jit(173), ch)
bench("ext_pow_table 44", _ext_pow_table_jit(44), ch)
bench("sq_chain 3", _sq_chain_jit(3), ch)
st = jnp.asarray(rng.integers(0, 1 << 31, (12,)).astype(np.uint32))
bench("perm (1-lane poseidon)", _perm_jit("poseidon"), st, st)
# a flush of one 16-element piece
sig = (("flat", (16,), (16,)),)
a = jnp.asarray(rng.integers(0, 1 << 31, (16,)).astype(np.uint32))
bench("flush 16 els", _flush_jit("poseidon", sig), st, st, a, a)

# big absorb flush: ~360 elements = ~45 sequential 1-lane permutations
big = jnp.asarray(rng.integers(0, 1 << 31, (360,)).astype(np.uint32))
sig2 = (("flat", (360,), (360,)),)
bench("flush 360 els (~45 perms)", _flush_jit("poseidon", sig2),
      st, st, big, big)
sig3 = (("flat", (64,), (64,)),)
m64 = big[:64]
bench("flush 64 els (~9 perms)", _flush_jit("poseidon", sig3),
      st, st, m64, m64)
