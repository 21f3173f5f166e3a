#!/usr/bin/env python3
"""Dev-only one-shot rewriter: convert round(expr, d) presentation sites
in src/main/scala/graft/queries/*.scala to the Fx fixed-point pattern.

- Scala code (outside string literals): round( -> Fx.fx(
- Inside triple-quoted SQL literals: round(E, d) -> ${Fx.fxSql("E", d)},
  adding the `s` interpolator prefix if absent (escaping $ and \\ in the
  rest of the literal when doing so).

Usage: fx_rewrite.py <file> [--apply]   (default: dry-run report)
"""
import sys, re

def find_triple_strings(src):
    """Return list of (start, end, interpolated) for \"\"\"...\"\"\" spans.
    start/end are indexes of the opening/closing quote runs (end = index
    AFTER the closing quotes). interpolated = True if preceded by ident
    char run ending in s/f/raw (we only care about s)."""
    spans = []
    i = 0
    while True:
        j = src.find('"""', i)
        if j < 0:
            break
        k = src.find('"""', j + 3)
        if k < 0:
            break
        # closing quotes may be part of a longer quote run ("""" edge) - not in this codebase
        pre = src[:j]
        m = re.search(r'([A-Za-z_]+)$', pre)
        interp = bool(m and m.group(1) == 's')
        spans.append((j, k + 3, interp))
        i = k + 3
    return spans

def match_paren(s, i):
    """i points at '('; return index of matching ')'. Skips single-quoted
    SQL strings so parens inside literals don't count."""
    depth = 0
    in_sq = False
    while i < len(s):
        c = s[i]
        if in_sq:
            if c == "'":
                in_sq = False
        elif c == "'":
            in_sq = True
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parens")

def split_args(inner):
    """Split 'expr, d' at the top-level comma (last one)."""
    depth = 0
    in_sq = False
    last = -1
    for i, c in enumerate(inner):
        if in_sq:
            if c == "'":
                in_sq = False
        elif c == "'":
            in_sq = True
        elif c in '([':
            depth += 1
        elif c in ')]':
            depth -= 1
        elif c == ',' and depth == 0:
            last = i
    if last < 0:
        return inner.strip(), '0'
    return inner[:last].strip(), inner[last + 1:].strip()

def rewrite_sql_literal(body):
    """Rewrite round(...) calls inside a SQL literal body. Returns
    (new_body, count)."""
    out = []
    i = 0
    n = 0
    while True:
        m = re.search(r'\bround\s*\(', body[i:])
        if not m:
            out.append(body[i:])
            break
        start = i + m.start()
        op = i + m.end() - 1
        cl = match_paren(body, op)
        expr, d = split_args(body[op + 1:cl])
        if not re.fullmatch(r'\d+', d):
            # not a literal digit count - leave untouched
            out.append(body[i:cl + 1])
            i = cl + 1
            continue
        # a multi-line argument would put a raw newline inside a Scala
        # string literal - collapse margin continuation into one space
        expr = re.sub(r'\s*\n\s*\|?\s*', ' ', expr)
        esc = expr.replace('\\', '\\\\').replace('"', '\\"')
        out.append(body[i:start])
        m2 = re.fullmatch(r'\$\{(.+)\}', expr, re.S)
        if m2 and '${' not in m2.group(1):
            # the whole arg is one interpolation: pass the Scala expr
            out.append('${Fx.fxSql(%s, %s)}' % (m2.group(1), d))
        elif '$' in expr:
            # mixed SQL + interpolation: nested s-literal keeps the
            # embedded $vars live
            out.append('${Fx.fxSql(s"%s", %s)}' % (esc, d))
        else:
            out.append('${Fx.fxSql("%s", %s)}' % (esc, d))
        i = cl + 1
        n += 1
    return ''.join(out), n

def rewrite_code(seg):
    """Outside strings: round( -> Fx.fx( (whole-word), skipping
    comment lines (//, *, /*)."""
    out = []
    n = 0
    for line in seg.split('\n'):
        if re.match(r'\s*(//|\*|/\*)', line):
            out.append(line)
            continue
        new, k = re.subn(r'(?<![.\w])round\s*\(', 'Fx.fx(', line)
        out.append(new)
        n += k
    return '\n'.join(out), n

def main():
    path = sys.argv[1]
    apply_ = '--apply' in sys.argv
    src = open(path).read()
    spans = find_triple_strings(src)
    pieces = []
    pos = 0
    total_code = total_sql = 0
    prefixed = 0
    for (a, b, interp) in spans:
        code, nc = rewrite_code(src[pos:a])
        total_code += nc
        body = src[a + 3:b - 3]
        new_body, ns = rewrite_sql_literal(body)
        total_sql += ns
        if ns and not interp:
            # escape pre-existing $ and \ outside our insertions:
            # do it on the ORIGINAL body, then re-run the rewrite
            body2 = body.replace('$', '$$').replace('\\', '\\\\')
            new_body, ns2 = rewrite_sql_literal(body2)
            assert ns2 == ns
            # add the s prefix: it attaches to the opening quotes
            code = code + 's'
            prefixed += 1
        pieces.append(code)
        pieces.append('"""' + new_body + '"""')
        pos = b
    tail, nc = rewrite_code(src[pos:])
    total_code += nc
    pieces.append(tail)
    result = ''.join(pieces)
    print(f"{path}: code-side {total_code}, sql-side {total_sql}, "
          f"literals s-prefixed {prefixed}")
    if apply_:
        open(path, 'w').write(result)
    else:
        import difflib
        for line in difflib.unified_diff(src.splitlines(), result.splitlines(),
                                         lineterm='', n=1):
            print(line)

if __name__ == '__main__':
    main()
