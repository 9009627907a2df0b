"""Source adapters (SURVEY.md §2.1): land external data as DataFrames.

The reference fetches with requests + tempfile + zipfile in a serial loop
(/root/reference/publish_to_catalog.py:68-80, 316-325); here ingestion is
partitioned: binaryFile scans for blobs, distributed CSV parse, and
errors-as-data instead of exceptions.
"""
