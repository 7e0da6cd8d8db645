"""Item sinks: UTF-8 JSON round-trip (E7) and partitioned parquet layout."""

import json
import os

from crawler_spark.sources.sinks import write_items_json, write_items_partitioned


def _items_df(spark):
    rows = [
        ("https://a.local/1", "a.local", "市政道路改造项目招标公告", "2024-06-01", "全国", 2),
        ("https://a.local/2", "a.local", "污水处理设备采购", "2024-06-02", "全国", 2),
        ("https://b.local/1", "b.local", "桥梁加固公示", "2024-06-01", "河南", 3),
    ]
    return spark.createDataFrame(
        rows, "url string, source string, title string, publish_time string, province string, wave int"
    )


def test_json_sink_utf8_roundtrip(spark, tmp_path):
    out = str(tmp_path / "items_json")
    write_items_json(_items_df(spark), out)
    texts = []
    for f in os.listdir(out):
        if f.startswith("part-"):
            with open(os.path.join(out, f), encoding="utf-8") as fh:
                texts += [json.loads(line) for line in fh if line.strip()]
    assert sorted(t["title"] for t in texts)[0] == "市政道路改造项目招标公告"
    # raw bytes really are UTF-8 Chinese, not escaped ASCII
    raw = b"".join(
        open(os.path.join(out, f), "rb").read()
        for f in os.listdir(out) if f.startswith("part-")
    )
    assert "招标".encode("utf-8") in raw


def test_partitioned_sink_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "items_pq")
    write_items_partitioned(_items_df(spark), out)
    assert os.path.isdir(os.path.join(out, "source=a.local", "publish_date=2024-06-01"))
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: a (source, date) filter must hit one directory
    assert back.filter("source = 'a.local' AND publish_date = DATE '2024-06-01'").count() == 1


def test_stream_lakestore_sink_exactly_once(spark, tmp_path):
    """foreachBatch + idempotent commit-id append = effective
    exactly-once: the store equals the batch source, one commit per
    micro-batch, and replaying a batch's append (the at-least-once
    failure mode) must not duplicate rows."""
    from crawler_spark.state.lakestore import LakeStore
    from crawler_spark.streaming.events import stream_append_lakestore

    src = "/root/testdata/sf0.001/events.parquet"
    store = LakeStore(str(tmp_path / "lake"))
    out, commits = stream_append_lakestore(spark, src, store, n_splits=4)
    n_src = spark.read.parquet(src).count()
    assert out.count() == n_src
    assert len(commits) == 4 and commits == sorted(commits)

    # simulate a foreachBatch replay: re-append the SAME micro-batch
    # under the SAME commit id (the at-least-once failure mode)
    import os
    last_dir = os.path.join(store.root, "events_sink", commits[-1])
    replay = spark.read.parquet(last_dir).localCheckpoint()
    store.append(replay, "events_sink", commits[-1])
    assert store.commits("events_sink") == commits  # manifest unchanged
    back = store.read(spark, "events_sink")
    assert back.count() == n_src  # replaced, not appended twice
    assert back.dropDuplicates(["event_id"]).count() == n_src
