from .ivf import build_ivf_index, ivf_index_search  # noqa: F401
from .knn import brute_force_knn, lsh_knn  # noqa: F401
