"""Operator layer: validation/quarantine, normalization, generation,
corruption, dedup/similarity/text (LLM-pipeline) operators."""
