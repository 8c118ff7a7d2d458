"""View half of the shared MVC toolkit
(ref: scripts/common/views/__init__.py)."""
