from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automated_etl_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def football_csv(tmp_path_factory) -> str:
    """Fixture CSV replicating football_results.csv quirks (FIXTURES.md §A1):
    mixed date formats, ambiguous dates, TRUE/FALSE booleans, empty cells,
    mixed-case team names."""
    rows = [
        "date,home_team,away_team,home_score,away_score,tournament,city,country,neutral",
        # yyyy-MM-dd block (like the real file's first 127 rows)
        "1872-11-30,SCOTLAND,england,0,0,Friendly,Glasgow,Scotland,FALSE",
        "1873-03-08,England,scotland,4,2,Friendly,London,England,FALSE",
        # dd-MM-yyyy block (the remaining rows)
        "30-11-1990,brazil,Argentina,2,1,FIFA World Cup,Turin,Italy,TRUE",
        "03-02-1900,Uruguay,CHILE,5,0,FIFA World Cup,Montevideo,Uruguay,FALSE",  # ambiguous
        "15-06-2014,germany,portugal,4,0,FIFA World Cup,Salvador,Brazil,TRUE",
        "13-07-2014,Germany,argentina,1,0,FIFA World Cup,Rio De Janeiro,Brazil,TRUE",
        # empty score / neutral cells → null handling
        "01-01-2000,France,Italy,,1,UEFA Euro qualification,Paris,France,",
        "02-01-2000,Spain,Portugal,2,,Friendly,Madrid,Spain,TRUE",
    ]
    p = tmp_path_factory.mktemp("fixture") / "football_results.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)
