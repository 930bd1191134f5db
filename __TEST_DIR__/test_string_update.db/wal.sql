CREATE TABLE test (a INTEGER, b STRING);;
INSERT INTO test VALUES (NULL, 'hello'), (13, 'abcdefgh'), (12, NULL);
CREATE TABLE test (a INTEGER, b STRING);;
INSERT INTO test VALUES (NULL, 'hello'), (13, 'abcdefgh'), (12, NULL);
