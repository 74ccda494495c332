"""Pure operator semantics (no Ray, no I/O) — the numerical core every
stage and the golden oracle share."""
