"""Storage layer: partitioned Parquet (date=/hour=/minute= layout with
trace_id bloom filters), hot/cold union, time-prefix pruning."""
