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
