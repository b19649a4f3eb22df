"""Programming-language detection by filename — the enry analog for the
reference's blob Language field (indexer/blob.go:116-127: enry.GetLanguage
(filename, data), default "Text"; goldens indexer/blob_test.go:71-84:
"Makefile.am" → "Makefile", "foo.rb" → "Ruby").

enry's full detector chains filename → extension → shebang → content
classifier; the filename and extension stages decide the overwhelming
majority of real repositories and are exactly expressible as ONE pure-JVM
CASE expression (zero Python, folds into whole-stage codegen).  The content
classifier stage is out of scope for the webtext payload — `defaultLanguage`
("Text") is the fallback, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_LANGUAGE = "Text"  # blob.go:22 defaultLanguage

# special FILENAMES (enry's matchers by exact name / prefix) — checked
# before the extension map, like enry's strategy order
_FILENAMES: dict[str, str] = {
    "makefile": "Makefile",
    "gnumakefile": "Makefile",
    "dockerfile": "Dockerfile",
    "rakefile": "Ruby",
    "gemfile": "Ruby",
    "guardfile": "Ruby",
    "podfile": "Ruby",
    "vagrantfile": "Ruby",
    "brewfile": "Ruby",
    "cmakelists.txt": "CMake",
    "build.gradle": "Gradle",
    "settings.gradle": "Gradle",
    "gruntfile.js": "JavaScript",
    "gulpfile.js": "JavaScript",
    ".gitignore": "Ignore List",
    ".gitattributes": "Git Attributes",
    ".editorconfig": "EditorConfig",
    ".babelrc": "JSON",
    ".eslintrc": "JSON",
}

# extension → language (lowercased, last dot segment)
_EXTENSIONS: dict[str, str] = {
    "rb": "Ruby", "py": "Python", "go": "Go", "js": "JavaScript",
    "mjs": "JavaScript", "cjs": "JavaScript", "jsx": "JSX",
    "ts": "TypeScript", "tsx": "TSX", "java": "Java", "c": "C", "h": "C",
    "cpp": "C++", "cc": "C++", "cxx": "C++", "hpp": "C++", "hh": "C++",
    "cs": "C#", "php": "PHP", "rs": "Rust", "kt": "Kotlin",
    "kts": "Kotlin", "swift": "Swift", "m": "Objective-C",
    "mm": "Objective-C++", "scala": "Scala", "sc": "Scala",
    "sh": "Shell", "bash": "Shell", "zsh": "Shell", "fish": "fish",
    "ps1": "PowerShell", "bat": "Batchfile", "cmd": "Batchfile",
    "pl": "Perl", "pm": "Perl", "r": "R", "lua": "Lua", "hs": "Haskell",
    "erl": "Erlang", "hrl": "Erlang", "ex": "Elixir", "exs": "Elixir",
    "clj": "Clojure", "cljs": "ClojureScript", "groovy": "Groovy",
    "dart": "Dart", "jl": "Julia", "nim": "Nim", "zig": "Zig",
    "ml": "OCaml", "mli": "OCaml", "fs": "F#", "fsx": "F#",
    "vb": "Visual Basic .NET", "pas": "Pascal", "d": "D", "ada": "Ada",
    "f": "Fortran", "f90": "Fortran", "cob": "COBOL", "asm": "Assembly",
    "s": "Assembly", "sql": "SQL", "html": "HTML", "htm": "HTML",
    "xhtml": "HTML", "css": "CSS", "scss": "SCSS", "sass": "Sass",
    "less": "Less", "xml": "XML", "xsl": "XSLT", "json": "JSON",
    "jsonl": "JSON", "yml": "YAML", "yaml": "YAML", "toml": "TOML",
    "ini": "INI", "cfg": "INI", "md": "Markdown", "markdown": "Markdown",
    "rst": "reStructuredText", "tex": "TeX", "txt": "Text", "text": "Text",
    "csv": "CSV", "tsv": "TSV", "proto": "Protocol Buffer",
    "graphql": "GraphQL", "vue": "Vue", "svelte": "Svelte",
    "ipynb": "Jupyter Notebook", "gradle": "Gradle", "cmake": "CMake",
    "mk": "Makefile", "am": "Makefile", "tf": "HCL", "hcl": "HCL",
    "nix": "Nix", "vim": "Vim Script", "el": "Emacs Lisp",
    "lisp": "Common Lisp", "scm": "Scheme", "rkt": "Racket",
    "sol": "Solidity", "v": "Verilog", "vhd": "VHDL", "tcl": "Tcl",
    "awk": "Awk", "sed": "sed", "diff": "Diff", "patch": "Diff",
    "svg": "SVG", "tmpl": "Smarty", "j2": "Jinja", "jinja": "Jinja",
    "erb": "HTML+ERB", "haml": "Haml", "slim": "Slim", "pug": "Pug",
    "coffee": "CoffeeScript", "elm": "Elm", "purs": "PureScript",
    "res": "ReScript", "wat": "WebAssembly", "wasm": "WebAssembly",
    "cu": "Cuda", "cl": "OpenCL", "glsl": "GLSL", "hlsl": "HLSL",
    "gd": "GDScript", "feature": "Gherkin", "bib": "BibTeX",
    "org": "Org", "adoc": "AsciiDoc", "pod": "Pod", "rdoc": "RDoc",
    "textile": "Textile", "creole": "Creole", "wiki": "MediaWiki",
}


def prog_language_col(file_name: Column) -> Column:
    """file_name → programming-language name, pure JVM.

    Strategy order mirrors enry: exact/prefix filename matchers first
    ("Makefile.am" → Makefile because the NAME starts with "Makefile",
    blob_test.go:71-77), then the lowercased final extension, then "Text".
    One chained CASE expression — constant-folds into codegen; no UDF.
    """
    lower = F.lower(file_name)
    ext = F.element_at(F.split(lower, r"\."), -1)
    expr = F.lit(None).cast("string")
    # build innermost-first: extension map, then filename overrides
    for e, lang in _EXTENSIONS.items():
        expr = F.when(ext == e, F.lit(lang)).otherwise(expr)
    for name, lang in _FILENAMES.items():
        expr = F.when(lower == name, F.lit(lang)).otherwise(expr)
    # enry's Makefile filename matcher is a prefix match: Makefile.am,
    # Makefile.in, makefile.unix all land on Makefile
    expr = F.when(lower.startswith("makefile"), F.lit("Makefile")).otherwise(expr)
    expr = F.when(lower.startswith("dockerfile"), F.lit("Dockerfile")).otherwise(expr)
    return F.coalesce(expr, F.lit(DEFAULT_LANGUAGE))
