"""Distributed operators: extraction, dedup, similarity, text stats.

Each operator is expressed Spark-first (DataFrame/Catalyst); Python
appears only inside Arrow-batched UDFs where built-in expressions
genuinely can't express the semantics (the regex extraction engine).
"""
