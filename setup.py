"""Shim for environments whose setuptools predates reliable PEP 660
editable installs (configuration lives in pyproject.toml)."""
from setuptools import setup

setup()
