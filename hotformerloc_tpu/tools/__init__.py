"""Offline dataset tooling: tuple generation, preprocessing,
split geometry. CPU-only, no jax dependency.

Covers the reference's datasets/ generation scripts
(/root/reference/datasets/pointnetvlad/, WildPlaces/, CSWildPlaces/,
CSCampus3D/) as importable modules with CLIs.
"""
