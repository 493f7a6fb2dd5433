"""U1: salted-rowkey scalar function (util/GetRowKeyUDF.java:18-62; salting
algorithm util/HBaseUtil.java:137-147).

The reference salts HBase rowkeys `NN_pk` (hash-mod bucket prefix) to avoid
region hotspots, with the bucket list live-reloaded from MySQL config every
10s. Under the Spark design the hotspot problem disappears (shuffle hash
partitioning + AQE skew handling), so this exists for output parity of dim
rowkeys only. Bucket choice uses Spark's JVM-side hash (not Java
String.hashCode — bucket *distribution*, not bucket *values*, is the
contract), and the "live reload" is simply passing the current bucket count
per batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def salted_row_key(pk: Column | str, n_buckets: int = 3) -> Column:
    """`NN_pk` with NN = hash(pk) mod n_buckets, zero-padded to 2 digits."""
    c = F.col(pk) if isinstance(pk, str) else pk
    bucket = F.pmod(F.hash(c.cast("string")), F.lit(n_buckets))
    return F.concat(F.lpad(bucket.cast("string"), 2, "0"), F.lit("_"), c.cast("string"))
