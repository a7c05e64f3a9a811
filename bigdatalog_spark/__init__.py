"""bigdatalog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ashkapsky/BigDatalog (SIGMOD 2016), built
Spark-first on the DataFrame API + driver-side semi-naive fixpoint loops.
"""

from .datalog.context import BigDatalogContext, EngineConfig
from .datalog.fixpoint import FixpointConfig
from .session import build_session

__all__ = [
    "BigDatalogContext",
    "EngineConfig",
    "FixpointConfig",
    "build_session",
]

__version__ = "0.1.0"
