from .ntriples_io import read_ntriples, write_ntriples  # noqa: F401
