"""morphik_core_spark — a PySpark-native engine with the query and
data-processing capabilities of morphik-org/morphik-core.

Design: DataFrame/SQL-first (Catalyst plans everything), Arrow-vectorized
pandas UDFs only for kernels Spark can't express (quantization, MaxSim,
hash embedding, chunking). See SURVEY.md for the structural analysis of
the reference and the operator inventory this package covers.
"""

__version__ = "0.1.0"

from morphik_core_spark.session import get_spark  # noqa: F401
