"""Spark-side operators: packed-array detrend, rollup tiers, gap-fill,
codecs, lakehouse tables, and the end-to-end pipeline."""
