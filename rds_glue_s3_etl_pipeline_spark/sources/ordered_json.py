"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the reference's S3 feed, as a first-class source.

The reference reads ONE JSON object-array document and its downstream
contract depends on record order (`/root/reference/gule_test_job.py:
54-72` — pandas keeps file order; output order at `:125-163` follows
it). Plain ``spark.read.json`` gives no row order at all. This source
makes the contract explicit: every record carries a ``_seq`` column =
its 0-based position in the document, so any later stage can
``orderBy("_seq")`` to reproduce feed order (SURVEY §2.6 O1) without
relying on accidental partition layout.

A single JSON document is not splittable (the array must be parsed
whole), so the source exposes exactly one input partition — honest
about the reference's own constraint. The scale path for big feeds is
JSONL, which ``spark.read.json`` already splits; this source exists
for the one-document contract plus order.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class OrderedJsonDataSource(DataSource):
    """``spark.read.format("ordered_json").schema(...).load(path)``.

    Options: ``path`` (required). The user-supplied schema is applied
    to each record dict by field name; ``_seq long`` must be the last
    schema field.
    """

    @classmethod
    def name(cls) -> str:
        return "ordered_json"

    def schema(self) -> str:
        # No inference: a pinned schema is the scale rule (see
        # readers.read_json_records). Require the caller to pass one.
        raise NotImplementedError(
            "ordered_json requires an explicit .schema(...) ending in '_seq long'"
        )

    def reader(self, schema) -> "OrderedJsonReader":
        return OrderedJsonReader(self.options, schema)


class OrderedJsonReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ordered_json: missing required option 'path'")
        self.fields = [f.name for f in schema.fields]
        if self.fields[-1] != "_seq":
            raise ValueError("ordered_json: schema must end with '_seq long'")

    def partitions(self):
        # One document == one partition (a JSON array is unsplittable).
        return [InputPartition(0)]

    def read(self, partition):
        with open(self.path, encoding="utf-8") as fh:
            records = json.load(fh)
        cols = self.fields[:-1]
        for seq, rec in enumerate(records):
            yield tuple(rec.get(c) for c in cols) + (seq,)
