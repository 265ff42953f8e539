"""Arrow Flight remote surface: segment transfer receiver + query
result streaming (the reference's remote/ package re-expressed over
pyarrow.flight)."""
