#!/usr/bin/env python3
"""Extract one query's `## <name>` section from a PLANS.md blob.

Usage: extract_plan.py <plans-md-file-or-'-'> <query> [out]
Used to build plans/r12/<query>_{before,after}.txt from PLANS.md at two
revisions (git show <rev>:PLANS.md | extract_plan.py - <query> <out>).
"""
import sys

def main():
    src, query = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    text = sys.stdin.read() if src == "-" else open(src).read()
    marker = f"\n## {query}\n"
    i = text.find(marker)
    if i < 0:
        sys.exit(f"no section for {query}")
    j = text.find("\n## ", i + 1)
    section = text[i + 1 : j if j > 0 else len(text)]
    if out:
        open(out, "w").write(section)
    else:
        sys.stdout.write(section)

if __name__ == "__main__":
    main()
