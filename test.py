"""Generation entry point, named for parity with the reference's test.py
(a generation CLI despite the name — reference test.py:126-153).
Delegates to cli.py; see `python cli.py --help`."""

from cli import main

if __name__ == "__main__":
    main()
