"""face_hunter_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference system face-hunters/face-hunter (see SURVEY.md).

The reference is a single-node Python pipeline (video → face detect →
embed → kNN entity linking → scene smoothing → RDF triples).  This
package re-expresses the same computation as declarative Spark
DataFrame plans over an interleaved text+media ``documents`` table:

    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset>>)

All hot-path work is vectorized (built-in ``pyspark.sql.functions`` or
Arrow-batched pandas UDFs); there is no per-row Python anywhere.
"""

__version__ = "0.1.0"
