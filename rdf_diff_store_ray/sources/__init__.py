from .ntriples_io import (  # noqa: F401
    read_nquads,
    read_ntriples,
    read_turtle,
    write_nquads,
    write_ntriples,
)
