"""Pipeline stages: detection driver, grouping driver, dedup, box post-filtering.

Device compute (model forwards, NMS, distance matrices, K-means) lives in
models/ and ops/; this package is the host-side orchestration around it —
video decode, filter/adjust/crop business logic, file IO, CSV audit logs —
arranged so host work overlaps device work (prefetch decode, async writes).
"""
