"""Shared scalar-function building blocks (engine-agnostic hashing,
tokenization expressions) used across operators and oracles."""

from engine.functions.hashing import DUCK_H60, SPARK_H60, h60_py

__all__ = ["DUCK_H60", "SPARK_H60", "h60_py"]
