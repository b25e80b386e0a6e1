"""nilm_data_framework_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of brijeshmodi12/NILM-Data-Framework.

Design (see SURVEY.md §1.3): one long-format ``readings`` fact table plus
small dimension tables (``channels``, ``label_keywords``), every operator a
pure DataFrame transformation planned by Catalyst. ``applyInPandas`` /
``mapInPandas`` only where built-in operators cannot express the semantics
(sliding-window tensorization, exact-parity kernels, multimodal decode).

The reference is a single-process pandas framework (UnifiedNILM/UnifiedNILM.py);
this package re-expresses its semantics Spark-first for 100 TB scale.
"""

__version__ = "0.1.0"

from nilm_data_framework_spark.session import get_session  # noqa: F401
