"""Controller half of the shared MVC toolkit
(ref: scripts/common/view_controllers/__init__.py)."""
