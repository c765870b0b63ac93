from .build import build_index, IndexBuildConfig  # noqa: F401
from .reader import IndexReader, ShardReader  # noqa: F401
