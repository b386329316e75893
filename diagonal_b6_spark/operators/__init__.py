"""DataFrame-level operators: cell covers, spatial joins, kNN, tiles,
query predicates, aggregations, dedup/text/similarity pipelines."""
