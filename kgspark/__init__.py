"""kgspark — a from-scratch PySpark-native knowledge-graph construction
engine with the query/data-processing capabilities of thewindow-in/graphiti
(reference, read-only, at /root/reference), re-expressed as batch DataFrame
DAGs per SURVEY.md.
"""

__version__ = "0.1.0"
