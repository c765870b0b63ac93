"""Learning-to-rank rescoring (solr/contrib/ltr).

Feature extraction (ltr/feature/*.java), normalizers (ltr/norm/*.java) and
scoring models (ltr/model/*.java) over the engine's first-pass top-N —
the LTRQParserPlugin `{!ltr model=m reRankDocs=N efi.*=...}` flow
(LTRQParserPlugin.java:62, LTRScoringQuery.java:63).

Features vectorize over the candidate doc set: per shard one searchsorted
membership pass gathers docvalues / norms; SolrFeature evaluates its query
through the production kernels and joins scores by doc id. Models score a
(docs x features) float matrix in one pass: LinearModel is a matvec
(LinearModel.java:117-122), MultipleAdditiveTreesModel descends all docs
through each tree simultaneously with the reference's NODE_SPLIT_SLACK
threshold bump (MultipleAdditiveTreesModel.java:124,151,180), and
NeuralNetworkModel is a chain of matmuls + activations
(NeuralNetworkModel.java:102).

Model/feature specs accept the Solr managed-store JSON layout, so a
feature store + model file written for the reference loads unchanged
(load_features / load_model dispatch on the "class" names).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# the reference bumps every threshold to absorb float noise at the split
NODE_SPLIT_SLACK = np.float32(1e-6)


# --------------------------------------------------------------------------
# features
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class OriginalScoreFeature:
    """ltr/feature/OriginalScoreFeature.java: the first-pass query score."""
    name: str = "originalScore"

    def extract(self, ctx) -> np.ndarray:
        return ctx["orig"].copy()


@dataclass(frozen=True)
class ValueFeature:
    """ltr/feature/ValueFeature.java: a constant or an efi.* request
    parameter (required -> missing efi raises, else default 0)."""
    name: str
    value: object = 0.0  # float | "${param}"
    required: bool = False

    def extract(self, ctx) -> np.ndarray:
        v = self.value
        if isinstance(v, str) and v.startswith("${") and v.endswith("}"):
            key = v[2:-1]
            if key in ctx["efi"]:
                v = float(ctx["efi"][key])
            elif self.required:
                raise ValueError(f"missing efi parameter {key!r}")
            else:
                v = 0.0
        return np.full(len(ctx["docs"]), float(v))


@dataclass(frozen=True)
class FieldValueFeature:
    """ltr/feature/FieldValueFeature.java: a NUMERIC docvalues value
    (missing doc -> 0, the reference's DEFAULT_VALUE)."""
    name: str
    fld: str = ""

    def extract(self, ctx) -> np.ndarray:
        out = np.zeros(len(ctx["docs"]), dtype=np.float64)
        for shard, mine, idx in ctx["shard_slots"]:
            vals = shard.docvalues.get(self.fld)
            if vals is not None:
                out[mine] = vals.astype(np.float64)[idx]
        return out


@dataclass(frozen=True)
class FieldLengthFeature:
    """ltr/feature/FieldLengthFeature.java: the field length DECODED FROM
    THE NORM BYTE (':84-89 NORM_TABLE') — i.e. the SmallFloat-quantized
    doc length, not the true one."""
    name: str
    fld: str = ""  # '' = the main text field

    def extract(self, ctx) -> np.ndarray:
        from ..util.smallfloat import LENGTH_TABLE

        out = np.zeros(len(ctx["docs"]), dtype=np.float64)
        for shard, mine, idx in ctx["shard_slots"]:
            norms = (shard.norms if not self.fld
                     else shard.norms_for(shard.doc_ids,
                                          self.fld))
            out[mine] = LENGTH_TABLE[norms[idx]]
        return out


@dataclass(frozen=True)
class SolrFeature:
    """ltr/feature/SolrFeature.java: the score of another query on the
    candidate doc (0 when the doc doesn't match — defaultValue)."""
    name: str
    q: str = ""

    def extract(self, ctx) -> np.ndarray:
        t = ctx["searcher"].match_all(self.q)
        md = t["doc_id"].to_numpy().astype(np.int64)
        ms = t["score"].to_numpy().astype(np.float64)
        out = np.zeros(len(ctx["docs"]), dtype=np.float64)
        if len(md):
            # match_all returns doc-ordered rows: searchsorted membership
            idx = np.searchsorted(md, ctx["docs"])
            idx_c = np.minimum(idx, len(md) - 1)
            hit = md[idx_c] == ctx["docs"]
            out[hit] = ms[idx_c[hit]]
        return out


# --------------------------------------------------------------------------
# normalizers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class IdentityNormalizer:
    def normalize(self, v: np.ndarray) -> np.ndarray:
        return v


@dataclass(frozen=True)
class MinMaxNormalizer:
    """(v - min) / (max - min), MinMaxNormalizer.java:40-56."""
    min: float = 0.0
    max: float = 1.0

    def __post_init__(self):
        # MinMaxNormalizer.java throws at parse time for min >= max;
        # dividing by zero here would silently corrupt ranking with inf/nan
        if not self.max > self.min:
            raise ValueError(
                f"MinMaxNormalizer requires max > min, got "
                f"min={self.min} max={self.max}")

    def normalize(self, v: np.ndarray) -> np.ndarray:
        return (v - self.min) / (self.max - self.min)


@dataclass(frozen=True)
class StandardNormalizer:
    """(v - avg) / std, StandardNormalizer.java:41-58."""
    avg: float = 0.0
    std: float = 1.0

    def normalize(self, v: np.ndarray) -> np.ndarray:
        return (v - self.avg) / self.std


# --------------------------------------------------------------------------
# models
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class LinearModel:
    """score = sum_i weight_i * normalized feature_i
    (LinearModel.java:117-122)."""
    weights: tuple  # (feature_name, weight) pairs, feature order

    def score(self, feats: dict[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(feats.values())))
        out = np.zeros(n, dtype=np.float64)
        for name, w in self.weights:
            out += w * feats[name]
        return out


@dataclass(frozen=True)
class TreeNode:
    """Internal: feature + slacked threshold; leaf: value."""
    feature: str | None = None
    threshold: float = 0.0
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None
    value: float = 0.0


@dataclass(frozen=True)
class MultipleAdditiveTreesModel:
    """Weighted regression-tree ensemble
    (MultipleAdditiveTreesModel.java:31): per tree, descend left when
    feature <= threshold + NODE_SPLIT_SLACK (:151,180); score = sum of
    weight * leaf over trees. All candidate docs descend simultaneously."""
    trees: tuple  # (weight, TreeNode) pairs

    def score(self, feats: dict[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(feats.values())))
        out = np.zeros(n, dtype=np.float64)
        for w, root in self.trees:
            # flatten to arrays once per tree
            fidx: list = []
            thr: list = []
            lft: list = []
            rgt: list = []
            val: list = []

            def flat(node) -> int:
                i = len(fidx)
                fidx.append(node.feature)
                thr.append(node.threshold)
                val.append(node.value)
                lft.append(-1)
                rgt.append(-1)
                if node.feature is not None:
                    lft[i] = flat(node.left)
                    rgt[i] = flat(node.right)
                return i

            flat(root)
            cur = np.zeros(n, dtype=np.int64)
            thr_a = np.asarray(thr, dtype=np.float64)
            val_a = np.asarray(val, dtype=np.float64)
            lft_a = np.asarray(lft, dtype=np.int64)
            rgt_a = np.asarray(rgt, dtype=np.int64)
            internal = np.array([f is not None for f in fidx])
            fmat = {i: feats[f] for i, f in enumerate(fidx)
                    if f is not None}
            while True:
                live = internal[cur]
                if not live.any():
                    break
                nodes = np.unique(cur[live])
                for nd in nodes:
                    m = live & (cur == nd)
                    go_left = fmat[int(nd)][m] <= thr_a[nd]
                    nxt = np.where(go_left, lft_a[nd], rgt_a[nd])
                    cur[m] = nxt
            out += w * val_a[cur]
        return out


_ACTIVATIONS = {
    "identity": lambda x: x,
    "relu": lambda x: np.maximum(x, 0.0),
    "leakyrelu": lambda x: np.where(x < 0, 0.01 * x, x),
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "tanh": np.tanh,
}


@dataclass(frozen=True)
class NeuralNetworkModel:
    """Feed-forward net (NeuralNetworkModel.java:30): per layer
    activation(W @ v + b); final layer must emit one value."""
    layers: tuple  # (matrix, bias, activation_name) triples

    def score(self, feats: dict[str, np.ndarray]) -> np.ndarray:
        raise NotImplementedError("scored via feature order; use "
                                  "score_matrix")

    def score_matrix(self, mat: np.ndarray) -> np.ndarray:
        v = mat.T  # (features, docs)
        for w, b, act in self.layers:
            v = _ACTIVATIONS[act](np.asarray(w) @ v
                                  + np.asarray(b)[:, None])
        if v.shape[0] != 1:
            raise ValueError("final layer must have one output")
        return v[0]


# --------------------------------------------------------------------------
# managed-store JSON loaders
# --------------------------------------------------------------------------

_FEATURE_CLASSES = {
    "org.apache.solr.ltr.feature.OriginalScoreFeature":
        lambda name, p: OriginalScoreFeature(name),
    "org.apache.solr.ltr.feature.ValueFeature":
        lambda name, p: ValueFeature(name, p.get("value", 0.0),
                                     bool(p.get("required", False))),
    "org.apache.solr.ltr.feature.FieldValueFeature":
        lambda name, p: FieldValueFeature(name, p["field"]),
    "org.apache.solr.ltr.feature.FieldLengthFeature":
        lambda name, p: FieldLengthFeature(name, p.get("field", "")),
    "org.apache.solr.ltr.feature.SolrFeature":
        lambda name, p: SolrFeature(name, p["q"]),
}

_NORM_CLASSES = {
    "org.apache.solr.ltr.norm.IdentityNormalizer":
        lambda p: IdentityNormalizer(),
    "org.apache.solr.ltr.norm.MinMaxNormalizer":
        lambda p: MinMaxNormalizer(float(p["min"]), float(p["max"])),
    "org.apache.solr.ltr.norm.StandardNormalizer":
        lambda p: StandardNormalizer(float(p["avg"]), float(p["std"])),
}


def load_features(spec: list[dict]) -> list:
    """Parse a feature-store JSON list ([{name, class, params}, ...])."""
    out = []
    for f in spec:
        cls = _FEATURE_CLASSES.get(f["class"])
        if cls is None:
            raise ValueError(f"unknown feature class {f['class']!r}")
        out.append(cls(f["name"], f.get("params") or {}))
    return out


def _load_tree(node: dict) -> TreeNode:
    if "value" in node:
        return TreeNode(value=float(node["value"]))
    return TreeNode(
        feature=node["feature"],
        threshold=float(np.float32(float(node["threshold"]))
                        + NODE_SPLIT_SLACK),
        left=_load_tree(node["left"]),
        right=_load_tree(node["right"]),
    )


def load_model(spec: dict):
    """Parse a model-store JSON dict ({class, features, params})."""
    cls = spec["class"]
    params = spec.get("params") or {}
    if cls == "org.apache.solr.ltr.model.LinearModel":
        order = [f["name"] for f in spec["features"]]
        w = params["weights"]
        missing = [n for n in order if n not in w]
        if missing:
            raise ValueError(f"model lacks weight(s) for {missing}")
        return LinearModel(tuple((n, float(w[n])) for n in order))
    if cls == "org.apache.solr.ltr.model.MultipleAdditiveTreesModel":
        trees = tuple((float(t["weight"]), _load_tree(t["root"]))
                      for t in params["trees"])
        return MultipleAdditiveTreesModel(trees)
    if cls == "org.apache.solr.ltr.model.NeuralNetworkModel":
        layers = tuple(
            (np.asarray(l["matrix"], dtype=np.float64),
             np.asarray(l["bias"], dtype=np.float64),
             l.get("activation", "identity"))
            for l in params["layers"])
        return NeuralNetworkModel(layers)
    raise ValueError(f"unknown model class {cls!r}")


def load_normalizers(spec: dict) -> dict:
    """Per-feature normalizer map from a model spec's features list."""
    out = {}
    for f in spec.get("features", []):
        norm = f.get("norm")
        if norm:
            out[f["name"]] = _NORM_CLASSES[norm["class"]](
                norm.get("params") or {})
    return out


# --------------------------------------------------------------------------
# rescoring
# --------------------------------------------------------------------------

def extract_features(searcher, docs: np.ndarray, orig: np.ndarray,
                     features: list, efi: dict | None = None
                     ) -> dict[str, np.ndarray]:
    """(docs x features) columns; one membership pass per shard feeds all
    shard-resident features."""
    docs = np.asarray(docs, dtype=np.int64)
    shard_slots = []
    for s in searcher.reader.shards:
        if not len(s.doc_ids):
            continue
        idx = np.searchsorted(s.doc_ids, docs)
        idx_c = np.minimum(idx, len(s.doc_ids) - 1)
        mine = s.doc_ids[idx_c] == docs
        if mine.any():
            shard_slots.append((s, mine, idx_c[mine]))
    ctx = {"searcher": searcher, "docs": docs, "orig": orig,
           "efi": efi or {}, "shard_slots": shard_slots}
    return {f.name: f.extract(ctx).astype(np.float64) for f in features}


def ltr_rescore(searcher, query, model, features: list,
                rerank_docs: int = 50, k: int = 10,
                normalizers: dict | None = None,
                efi: dict | None = None,
                round_nd: int | None = None) -> pa.Table:
    """LTRQParserPlugin flow: first-pass top rerank_docs by the base
    query, model-rescore those, return the top k by (ltr score desc,
    doc asc). Docs outside the rerank window keep their original order
    below, as the reference's ReRankCollector does — here only the
    reranked window is returned."""
    first = searcher.search(query, k=rerank_docs)
    docs = first["doc_id"].to_numpy().astype(np.int64)
    orig = first["score"].to_numpy().astype(np.float64)
    if not len(docs):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "orig_score": pa.array([], pa.float64()),
                         "ltr_score": pa.array([], pa.float64())})
    feats = extract_features(searcher, docs, orig, features, efi)
    for name, norm in (normalizers or {}).items():
        feats[name] = norm.normalize(feats[name])
    if isinstance(model, NeuralNetworkModel):
        mat = np.stack([feats[f.name] for f in features], axis=1)
        scores = model.score_matrix(mat)
    else:
        scores = model.score(feats)
    if round_nd is not None:
        from .services import _round_half_away_arr

        scores = _round_half_away_arr(scores, round_nd)
    order = np.lexsort((docs, -scores))[:k]
    return pa.table({
        "doc_id": pa.array(docs[order], pa.int64()),
        "orig_score": pa.array(orig[order], pa.float64()),
        "ltr_score": pa.array(scores[order], pa.float64()),
    })
