"""isidorus_web_scraper_spark — a from-scratch PySpark-native crawl engine.

Re-expresses the dataflow semantics of the reference
(`diegojromerolopez/isidorus-web-scraper`, an SQS/Redis/Postgres
microservice crawler) as iterative PySpark DataFrame rounds over a
parquet/Iceberg-style warehouse:

- the SQS frontier queue        -> per-round ``frontier`` DataFrame
- the Redis URL-seen set        -> ``seen`` table + Bloom pre-filter + anti-join
- the Go HTML tokenizer         -> vectorized Arrow UDF producing interleaved spans
- the Redis pending counter     -> loop-until-empty with per-round metrics
- per-host politeness (added)   -> groupBy(host).applyInPandas priority queues

See SURVEY.md for the full operator mapping (reference file:line cites)
and BASELINE.md for the scaling measurement protocol.
"""

__version__ = "0.1.0"
