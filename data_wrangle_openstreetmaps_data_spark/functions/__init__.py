"""Scalar function library: cleaning (street/city/postcode/key-class),
text analysis, and vector math — all as native Column expressions
(JVM-side, whole-stage-codegen friendly; no Python UDFs in the hot path).
"""
