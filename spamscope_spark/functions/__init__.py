"""Columnar building blocks (JVM-side where possible, Arrow pandas_udfs
only where built-ins cannot express the semantics)."""
