"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Re-creates the semantics of the reference DBDA15/graph-mining project
(exact triangle counting via node-iterator with degree ordering, k-truss
decomposition by iterative edge-support peeling, maximum-truss binary
search — see /root/reference/graph-mining-spark/.../Truss.scala and
MaximalTruss.scala) plus the standard link-graph suite (PageRank,
connected components via large-star/small-star, label propagation),
expressed Spark-first on the DataFrame API with Arrow/pandas-UDF kernels
only where built-ins cannot express the semantics.

Nothing here is a port: the reference is Scala RDD/DataSet code; this
engine declares logical plans with pyspark.sql and lets Catalyst/AQE pick
physical strategies, with explicit partitioning/skew handling where the
optimizer cannot know the algorithm's structure.
"""

__version__ = "0.1.0"
