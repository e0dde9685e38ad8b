"""Relational operator library (SURVEY §2c-2g).

Pure functions DataFrame -> DataFrame; every operator is declarative so
Catalyst owns the physical strategy. Scale notes live in each module.
"""
