#!/usr/bin/env python3
"""Regenerate README's query/spec counts from the ground truth.

Query count = registered `"qNNN_name" ->` keys in the src/main registries
(exactly what SparkEntry.queries serves). Spec count = "Total number of
tests run: N" parsed from an `sbt test` log, so the README can never
drift from CI output again (the round-13 verdict caught a hand-written
"~715" vs an actual 711).

Usage:  sbt -batch test | tee /tmp/test.log
        python3 tools/update_readme_counts.py /tmp/test.log
"""
import re
import subprocess
import sys

def main():
    if len(sys.argv) != 2:
        sys.exit("usage: update_readme_counts.py <sbt-test-log>")
    log = open(sys.argv[1]).read()
    m = re.findall(r"Total number of tests run: (\d+)", log)
    if not m:
        sys.exit("no 'Total number of tests run' line in the log")
    n_tests = int(m[-1])
    ok = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
    if ok and ok[-1][1] != "0":
        sys.exit(f"log shows {ok[-1][1]} failed tests — fix before stamping")

    src = subprocess.run(
        ["grep", "-rhoE", r'"q[0-9]+[a-z0-9_]*" *->'] +
        ["src/main/scala/graft/Queries.scala",
         "src/main/scala/graft/ExtQueries.scala",
         "src/main/scala/graft/LlmQueries.scala"],
        capture_output=True, text=True).stdout
    n_queries = len(set(t for t in src.split() if t.startswith('"q')))
    if n_queries == 0:
        sys.exit("no query registrations found — wrong cwd?")

    readme = open("README.md").read()
    readme = re.sub(r"# \d+ specs(, counts stamped by tools/update_readme_counts\.py)?",
                    f"# {n_tests} specs, counts stamped by tools/update_readme_counts.py",
                    readme)
    readme = re.sub(r"~?\d+ specs cover", f"{n_tests} specs cover", readme)
    readme = re.sub(r"All \d+ registered queries",
                    f"All {n_queries} registered queries", readme)
    open("README.md", "w").write(readme)
    print(f"README stamped: {n_queries} queries, {n_tests} specs")

if __name__ == "__main__":
    main()
