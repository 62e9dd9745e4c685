"""Source/sink operators: producer (publish) path and topic stand-ins."""
