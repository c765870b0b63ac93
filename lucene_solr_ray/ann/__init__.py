from .knn import brute_force_knn, lsh_knn  # noqa: F401
