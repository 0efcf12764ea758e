"""changegen_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``trailbehind/changegen`` (an OSM changefile diff/CDC pipeline) as idiomatic
Spark DataFrame computations, plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
that a 100 TB deployment needs.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC, sane shuffle defaults)
    sources     table loaders + OSM element schemas + fixture synthesis
    geo         pure-PySpark geometry kernel (no Sedona dependency)
    operators   changegen-parity operators (ids, tags, ways, dedup, changes)
    functions   text analysis, hashing/minhash/simhash, similarity
    streaming   structured-streaming event operators
    sinks       OSMChange XML sink
    pipeline    end-to-end generate_changes / generate_deletions
"""

__version__ = "0.1.0"
