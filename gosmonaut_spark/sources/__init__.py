"""Sources: pages-table scan + Pass-0 typed entity extraction."""
