"""SAS date parsing must not depend on the JVM default locale.

``MMM`` patterns consult the default locale; under a pt-BR JVM, English
month abbreviations ("FEB") would silently parse to NULL for every
pre-2015 row. parse_census_date therefore rewrites the month through an
explicit JAN..DEC map. Proven here by running a REAL Spark driver with
``-Duser.language=pt -Duser.country=BR`` in a subprocess (reference
behavior: transform.py:41-50 via Python strptime, which is
locale-independent — so must we be).
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from censo_escolar_spark.functions.dates import parse_census_date

spark = (
    SparkSession.builder.master("local[2]")
    .appName("locale-probe")
    .config("spark.driver.extraJavaOptions", "-Duser.language=pt -Duser.country=BR")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
lang = spark._jvm.java.util.Locale.getDefault().getLanguage()
assert lang == "pt", f"JVM locale override did not take: {lang}"

df = spark.createDataFrame(
    [("01JAN2011:00:00:00",), ("15FEB2013:00:00:00",), ("31DEC2014:23:59:59",),
     ("15XXX2013:00:00:00",), (None,)],
    "d string",
)
out = [r[0] for r in df.select(parse_census_date("d", 2013).alias("p")).collect()]
import datetime
expected = [datetime.date(2011, 1, 1), datetime.date(2013, 2, 15),
            datetime.date(2014, 12, 31), None, None]
assert out == expected, f"under pt locale: {out}"
print("LOCALE_OK")
spark.stop()
"""


def test_sas_dates_parse_under_pt_locale():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "LOCALE_OK" in proc.stdout
