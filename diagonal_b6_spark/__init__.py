"""diagonal_b6_spark -- a from-scratch PySpark-native spatial analytics engine
with the query and data-processing capabilities of the diagonal-b6 reference
(see SURVEY.md), built DataFrame-first on Catalyst/AQE.
"""

__version__ = "0.1.0"
