"""P-catalog: the reference's operator practice queries (SURVEY §2.11
P1–P20), re-expressed over the driver testdata. Populated incrementally."""
