"""Pipeline operators: extract (Stage 1), link (Stage 2), canonicalize
(Stage 3), materialize/resume (Stage 4), metrics (Stage 5), plus the
training-data suite (dedup, similarity, textstats, multimodal) and
relational building blocks (asof, sessionize)."""
