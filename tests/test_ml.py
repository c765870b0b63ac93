import numpy as np
import pyarrow.parquet as pq

from lucene_solr_ray.relational.ml import score_logistic, train_logistic

SF = "/root/testdata/sf0.001"


def test_logistic_regression_learns(ray_session):
    import ray.data

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["label"])
    labels = np.asarray(t["label"].to_pylist())
    # binarize: label vs rest (labels are small ints)
    major = np.bincount(labels).argmax()

    def binarize(tb):
        import pyarrow as pa

        y = (tb["label"].to_numpy(zero_copy_only=False) == major).astype(np.int32)
        return pa.table({"vec_id": tb["vec_id"], "embedding": tb["embedding"],
                         "y": pa.array(y, pa.int32())})

    ds = emb.map_batches(binarize, batch_format="pyarrow")
    model = train_logistic(ds, "embedding", "y", iterations=25, lr=1.0)
    # loss decreases
    assert model["loss_history"][-1] < model["loss_history"][0]
    scored = score_logistic(ds, "embedding", "vec_id", model).to_pandas()
    base_rate = max((labels == major).mean(), 1 - (labels == major).mean())
    y_true = (labels == major).astype(int)
    acc = (scored.sort_values("vec_id")["pred"].to_numpy() == y_true).mean()
    # must beat the majority-class baseline (the embeddings encode the label)
    assert acc >= base_rate, (acc, base_rate)


def test_logit_distributed_matches_local_reference(ray_session):
    """Distributed gradient partials must equal a single-process full-batch
    GD run (same iterations/lr/l2) up to float summation order."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from lucene_solr_ray.relational.ml import train_logistic

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"]).to_pandas()
    X = np.stack(t["embedding"].values).astype(np.float64)
    y = (t["label"].values == 0).astype(np.float64)

    # local reference: identical update rule to train_logistic
    w = np.zeros(X.shape[1] + 1)
    lr, l2, iters = 1.0, 1e-4, 10
    losses = []
    for _ in range(iters):
        z = X @ w[1:] + w[0]
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        err = p - y
        g = np.concatenate([[err.sum()], X.T @ err]) / len(y)
        g[1:] += l2 * w[1:]
        w = w - lr * g
        eps = 1e-12
        losses.append(
            float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).mean())
        )

    ds = ray.data.from_pandas(t.assign(y=y.astype(np.int32))[
        ["vec_id", "embedding", "y"]])
    model = train_logistic(ds, "embedding", "y", iterations=iters, lr=lr, l2=l2)
    assert np.allclose(model["weights"], w[1:], atol=1e-9)
    assert abs(model["bias"] - w[0]) < 1e-9
    assert np.allclose(model["loss_history"], losses, atol=1e-9)
    # loss must decrease
    assert model["loss_history"][-1] < model["loss_history"][0]
