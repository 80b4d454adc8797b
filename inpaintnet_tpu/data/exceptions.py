"""Dataset exceptions (reference DatasetManager/exceptions.py:1-23)."""


class TieException(Exception):
    pass


class ParsingException(Exception):
    pass


class LeadsheetParsingException(ParsingException):
    pass
