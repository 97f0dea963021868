"""CDC surface: change-event envelope, reference-parity transforms
(filter/concat/key/metadata), deterministic changelog fixture, and
last-write-wins apply (batch + streaming foreachBatch)."""
