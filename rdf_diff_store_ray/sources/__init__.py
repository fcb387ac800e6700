from .ntriples_io import read_ntriples, read_turtle, write_ntriples  # noqa: F401
