"""Parallelism: mesh construction and multi-host bootstrap."""
from .mesh import make_mesh
