"""lucene_solr_ray — a Ray-Data-native full-text index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of Apache
Lucene/Solr (reference: irvingzhang/lucene-solr @ /root/reference), expressed
as ray.data.Dataset pipelines: map_batches over zero-copy Arrow batches for
per-record stages, actor pools for stateful shard searchers, and
groupby/shuffle for the wide merge steps.

Nothing here calls ray.init(); the hosting process owns the Ray session.
"""

__version__ = "0.1.0"
