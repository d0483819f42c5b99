"""Pipeline plans: the staged fit/transform driver with point-in-time
artifact versioning, checkpoint-resume, and per-stage lineage metrics."""
