from .engine import MatchResult, search_database, search_database_files
from .output import render_csv, render_json
