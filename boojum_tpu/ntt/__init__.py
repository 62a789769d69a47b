from . import ntt
from .ntt import (
    bitreverse_gl,
    bitreverse_indices,
    coset_intt_cols,
    coset_ntt_cols,
    distribute_powers,
    get_plan,
    intt_cols,
    lde_cosets,
    lde_from_monomials,
    materialize_powers,
    ntt_cols,
)
