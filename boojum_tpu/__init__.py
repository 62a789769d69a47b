"""boojum_tpu — a TPU-native Boojum-class PLONKish + FRI proving framework.

Built from scratch in JAX/XLA/Pallas. Capability target: matter-labs/era-boojum
(see SURVEY.md); architecture target: TPU hardware (see BASELINE.md).
"""

__version__ = "0.1.0"


def enable_persistent_compilation_cache(path: str = None):
    """Point JAX's persistent compilation cache at ``path`` (default
    ~/.cache/boojum_jax). Over the axon tunnel a cold flagship prove spends
    minutes in XLA compiles; with the cache warm they are all hits."""
    import os

    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "boojum_jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: the prover dispatches ~100+ small jits that each
    # recompile in ~0.45 s per process when below the default threshold —
    # that alone was ~1 min of every cold start
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
