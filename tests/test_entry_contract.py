"""Driver-contract guards for __spark_entry__.py: the three functions
exist, queries()/oracle_sql() keys align, every oracle is a string, and
entry() returns a non-empty DataFrame with the triple schema on the
smoke-scale data."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "spark_entry",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)


def test_registry_shape():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert len(qs) >= 97
    # every oracle key names a query; all values are non-empty strings
    assert set(sqls) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())
    # rows-only set stays the documented seven (betweenness joined in
    # session 11: float dependency ratios are not SQL-reproducible)
    assert sorted(set(qs) - set(sqls)) == [
        "q_ann_ivf", "q_ann_lsh", "q_approx", "q_betweenness",
        "q_dedup_minhash", "q_dedup_simhash", "q_multimodal_features",
    ]
    assert all(callable(f) for f in qs.values())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["subj", "pred", "obj"]
    assert df.count() > 0
