"""Suite queries for the SQL DML statement front-end (Engine.sql):
INSERT INTO / INSERT OVERWRITE and MERGE statement forms.

Reference: parse/SemanticAnalyzer.java (INSERT path), exec/MoveTask.java,
parse/UpdateDeleteSemanticAnalyzer.java:86 (MERGE). Entries registered
here sit BELOW the r3 CORRECTNESS window (suite/__init__.py freeze rule).
"""

from __future__ import annotations
