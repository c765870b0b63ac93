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
