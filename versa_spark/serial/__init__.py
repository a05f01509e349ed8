"""Serializers: parse/write between Versa models and external formats.

Counterpart of /root/reference/tools/py/serial/. Parsers return Python quad
lists (fixture/doc scale, driver-side) plus Spark-native batch variants
where scale matters (csv.py, ntriples.py use DataFrame text sources).
"""
