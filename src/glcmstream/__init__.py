"""glcmstream — PySpark-native streaming GLCM analytics engine.

A from-scratch Structured Streaming engine re-expressing the GLCM
sliding-window pipeline of simo1427/libglcmsw (reference mount empty at
survey; semantics anchored to BASELINE.json) over Common-Crawl-style web
pages. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
